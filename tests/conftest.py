import shutil
import sys
import tempfile

import pytest

sys.path.insert(0, "/root/repo")


@pytest.fixture(scope="session")
def spark():
    from jodie_spark.session import get_spark

    s = get_spark("jodie_tests", master="local[4]")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    yield s


@pytest.fixture()
def tmpdir_path():
    d = tempfile.mkdtemp(prefix="jodie_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
