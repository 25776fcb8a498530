"""Round-13 measurement probe: isolate registry queries (bench
methodology: fn(spark, sf_dir) + count, min of N runs, labeled jobs)
and capture .explain("formatted") into plans/r13/<query>_<tag>.txt.

Usage: python tools/probe_queries.py <tag> q1,q2,... [runs]
"""
from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as entrymod  # noqa: E402
from jodie_spark.session import get_spark  # noqa: E402

def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2].split(",")
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("jodie_probe")
    # bench-equivalent warmup
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).count()
    from jodie_spark.sources.datasource import register as _reg
    _reg(spark)
    import tempfile
    w = os.path.join(tempfile.mkdtemp(prefix="jodie_warm_"), "t")
    spark.range(2).write.format("jodie_delta").mode("append").save(w)
    spark.read.format("jodie_delta").load(w).count()
    registry = entrymod.queries()
    out = {}
    plans_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", os.environ.get("JODIE_PLANS_TAG", "r14"))
    os.makedirs(plans_dir, exist_ok=True)
    for name in names:
        fn = registry[name]
        best, times = None, []
        spark.sparkContext.setJobDescription(f"probe:{name}")
        for _ in range(runs):
            t0 = time.time()
            df = fn(spark, sf_dir)
            n = df.count()
            dt = time.time() - t0
            times.append(round(dt, 3))
            best = dt if best is None else min(best, dt)
        spark.sparkContext.setJobDescription(None)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(f"# query: {name}  tag: {tag}\n# times: {times} (min {round(best,3)}s, {n} rows)\n\n")
            fh.write(buf.getvalue())
        out[name] = {"min_sec": round(best, 3), "times": times, "rows": n}
        print(f"# {name}: {round(best,3)}s {times} ({n} rows)", file=sys.stderr)
    print(json.dumps({"tag": tag, "sf_dir": sf_dir, "results": out}))

if __name__ == "__main__":
    main()
