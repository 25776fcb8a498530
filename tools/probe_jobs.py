"""Round-13 structural probe: run one registry query and dump every
Spark job it launched (description, stage count, task count, duration)
from the local UI REST API. Job counts and shapes are robust to this
machine's ambient I/O-plane drift, unlike wall-clock seconds.

Usage: python tools/probe_jobs.py q1[,q2,...] [runs_per_query]
"""
from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as entrymod  # noqa: E402
import jodie_spark.session as _sess  # noqa: E402


def _ui_spark():
    """get_spark() with the UI on (the REST API is the whole point)."""
    from pyspark.sql import SparkSession

    orig = SparkSession.Builder.config

    def patched(self, key=None, value=None, conf=None, **kw):
        b = orig(self, key, value, conf, **kw)
        if key == "spark.ui.enabled":
            b = orig(self, key, "true")
        return b

    SparkSession.Builder.config = patched
    try:
        return _sess.get_spark("jodie_jobprobe")
    finally:
        SparkSession.Builder.config = orig


def _api(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return json.load(r)


def main() -> None:
    names = sys.argv[1].split(",")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = _ui_spark()
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    base = f"{ui}/api/v1/applications/{app}"
    # warmup mirroring bench.py
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).count()
    from jodie_spark.sources.datasource import register as _reg

    _reg(spark)
    registry = entrymod.queries()
    for name in names:
        fn = registry[name]
        before = {j["jobId"] for j in _api(base, "/jobs")}
        spark.sparkContext.setJobDescription(f"probe:{name}")
        df = fn(spark, sf_dir)
        n = df.count()
        spark.sparkContext.setJobDescription(None)
        jobs = [j for j in _api(base, "/jobs") if j["jobId"] not in before]
        jobs.sort(key=lambda j: j["jobId"])
        stage_name = {}
        for st in _api(base, "/stages"):
            stage_name[st["stageId"]] = st.get("name", "")[:90]
        print(f"\n=== {name}: {len(jobs)} jobs, {n} rows ===")
        total_ms = 0
        for j in jobs:
            from datetime import datetime

            t0 = datetime.strptime(j["submissionTime"][:23], "%Y-%m-%dT%H:%M:%S.%f")
            t1 = datetime.strptime(j["completionTime"][:23], "%Y-%m-%dT%H:%M:%S.%f")
            ms = (t1 - t0).total_seconds() * 1000
            total_ms += ms
            desc = (j.get("description") or j["name"])[:110]
            names = "; ".join(
                sorted({stage_name.get(s, "?") for s in j["stageIds"]})
            )[:160]
            print(
                f"  job {j['jobId']:>4} {ms:7.0f}ms stages={len(j['stageIds'])}"
                f" tasks={j['numTasks']:>4} {desc}\n"
                f"       [{names}]"
            )
        print(f"  TOTAL job time {total_ms/1000:.2f}s (sum of per-job wall)")
        try:
            sqls = _api(base, "/sql?length=500")
        except Exception:
            sqls = []
        new_jobs = {j["jobId"] for j in jobs}
        for q in sqls:
            ids = set(q.get("successJobIds", [])) | set(q.get("failedJobIds", []))
            if ids & new_jobs:
                print(
                    f"  sql {q['id']:>4} {q.get('duration',0):>7}ms jobs={sorted(ids)} "
                    f"{(q.get('description') or '')[:80]!r} :: "
                    f"{(q.get('planDescription') or '').splitlines()[0][:90]}"
                )


if __name__ == "__main__":
    main()
