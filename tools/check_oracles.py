"""Local replica of the driver's correctness gate: run each
__spark_entry__ query at sf0.01 and diff it against its DuckDB oracle.

Comparison: row count, column-name set, and order-insensitive
value-multiset with light normalization (dates/timestamps → isoformat
strings, floats rounded to 9 significant digits, Decimal → float).
"""

from __future__ import annotations

import datetime
import decimal
import math
import sys
import traceback
from collections import Counter

import duckdb

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2].split(",") if len(sys.argv) > 2 else None


def freshness() -> int:
    """Audit-trail freshness: for every registered query, the newest
    round whose OFFICIAL driver artifact (CORRECTNESS_r*.json) has a
    hash-green row. The rotation in __spark_entry__.queries() should
    keep the oldest rows cycling through the 50-slot window; this table
    makes staleness visible in-repo instead of requiring a judge
    aggregation over the artifact history."""
    import glob
    import json
    import re

    newest: dict[str, int] = {}
    rounds: list[int] = []
    for f in sorted(glob.glob("/root/repo/CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", f).group(1))
        rounds.append(rnd)
        for q, v in json.load(open(f)).items():
            if v.get("hash_match"):
                newest[q] = max(newest.get(q, 0), rnd)
            elif v.get("rows_match") and not v.get("err"):
                newest.setdefault(q, 0)  # rows-only query: 0 = by design
    keys = list(entrymod.queries())
    by_round: dict[int, list[str]] = {}
    for q in keys:
        by_round.setdefault(newest.get(q, -1), []).append(q)
    latest = max(rounds) if rounds else 0
    stale = []
    for rnd in sorted(by_round):
        label = (
            "never official yet (registered after the newest artifact)" if rnd < 0
            else "rows-only by design" if rnd == 0
            else f"r{rnd}"
        )
        print(f"newest official green = {label}: {len(by_round[rnd])}")
        for q in sorted(by_round[rnd]):
            marker = ""
            if 0 < rnd <= latest - 2:
                marker = "  <-- STALE (>2 rounds old)"
                stale.append(q)
            print(f"  {q}{marker}")
    window = keys[:50]
    stale_missing = [q for q in stale if q not in window]
    print(
        f"\nFRESHNESS_SUMMARY "
        + json.dumps(
            {
                "latest_artifact_round": latest,
                "registered": len(keys),
                "stale_gt2_rounds": len(stale),
                "stale_not_in_next_window": stale_missing,
            },
            sort_keys=True,
        )
    )
    return 0


def norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0:
            return 0.0
        return float(f"{v:.9g}")
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return v


def main() -> int:
    from jodie_spark.session import get_spark

    spark = get_spark("oracle_check")
    con = duckdb.connect()
    for t in entrymod.__dict__.get("TPCH_TABLES", None) or [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    results: dict[str, str] = {}
    for name, fn in queries.items():
        if ONLY and name not in ONLY:
            continue
        results[name] = "FAIL"
        try:
            sdf = fn(spark, SF_DIR)
            scols = sorted(sdf.columns)
            srows = sdf.collect()
        except Exception:
            print(f"FAIL {name}: spark query raised")
            traceback.print_exc(limit=3)
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(srows)} rows, cols={scols}")
            results[name] = "ROWS-ONLY"
            continue
        try:
            res = con.execute(oracles[name])
            ocols_raw = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle raised: {e}")
            failures += 1
            continue
        ocols = sorted(ocols_raw)
        if scols != ocols:
            print(f"FAIL {name}: column mismatch spark={scols} oracle={ocols}")
            failures += 1
            continue
        if len(srows) != len(orows):
            print(f"FAIL {name}: row count spark={len(srows)} oracle={len(orows)}")
            failures += 1
            continue
        s_multiset = Counter(
            tuple(norm(row[c]) for c in scols) for row in srows
        )
        o_idx = {c: ocols_raw.index(c) for c in ocols}
        o_multiset = Counter(
            tuple(norm(row[o_idx[c]]) for c in ocols) for row in orows
        )
        if s_multiset != o_multiset:
            diff_s = list((s_multiset - o_multiset).items())[:3]
            diff_o = list((o_multiset - s_multiset).items())[:3]
            print(f"FAIL {name}: value mismatch; spark-only={diff_s} oracle-only={diff_o}")
            failures += 1
            continue
        print(f"PASS {name}: {len(srows)} rows")
        results[name] = "PASS"
    # Final machine-readable summary: survives Spark's \r progress-bar
    # interleaving that can swallow individual PASS lines on a shared tty.
    import json

    print(f"\n{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'}")
    summary = {
        "checked": len(results),
        "pass": sum(1 for v in results.values() if v == "PASS"),
        "rows_only": sum(1 for v in results.values() if v == "ROWS-ONLY"),
        "fail": sorted(k for k, v in results.items() if v == "FAIL"),
        "sf_dir": SF_DIR,
    }
    print("ORACLE_SUMMARY " + json.dumps(summary, sort_keys=True))
    return 1 if failures else 0


if __name__ == "__main__":
    if "--freshness" in sys.argv:
        sys.exit(freshness())
    sys.exit(main())
