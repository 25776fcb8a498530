"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Query set spans the engine's main paths: scan+agg, broadcast join,
Delta write+merge (dedup, SCD), log analytics, CDF, LSH dedup,
similarity search, and windowed events.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _warm_udf():
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def identity(s: pd.Series) -> pd.Series:
        return s

    identity.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(identity, "long")


from pyspark.sql.functions import col as F_col  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.0

    import __spark_entry__ as entrymod
    from jodie_spark.session import get_spark

    spark = get_spark("jodie_bench")

    # warm up JVM/codegen/parquet reader and the Arrow/pandas_udf worker
    # pool so the first timed query measures steady state, not session
    # initialization (the Python-worker spin-up is ~1-3 s once per
    # session; SCALE.md "Local-scale caveats")
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).count()
    spark.range(1000).select(_warm_udf()(F_col("id"))).collect()
    # python-datasource worker machinery is a separate one-time cost
    # (~15-20 s at local[32]); warm it with a 2-row roundtrip
    import tempfile as _tf

    from jodie_spark.sources.datasource import register as _reg_ds

    _reg_ds(spark)
    _warm_path = os.path.join(_tf.mkdtemp(prefix="jodie_warm_"), "t")
    spark.range(2).write.format("jodie_delta").mode("append").save(_warm_path)
    spark.read.format("jodie_delta").load(_warm_path).count()

    bench_queries = [
        "pricing_summary",
        "revenue_by_nation",
        "kill_duplicate_records",
        "remove_duplicate_records_pk",
        "append_without_duplicates",
        "type2_scd_upsert",
        "operation_metrics",
        "read_cdf",
        "exact_dedup_documents",
        "minhash_dedup",
        "simhash_dedup",
        "token_count",
        "pii_scrub",
        "normalize_text",
        "url_filter",
        "classifier_quality",
        "passage_dup_stats",
        "column_ddl_lifecycle",
        "similarity_topk",
        "embedding_dedup",
        "windowed_event_counts",
        "sessionize",
        "as_of_join",
        "range_join",
        "clean_corpus",
        "datasource_roundtrip",
        "doc_chunks",
        "embedding_quantize",
        "stratified_sample",
        "line_dedup",
        "pack_sequences",
        "incremental_dedup",
        "bloom_incremental_dedup",
        "minhash_index_probe",
        "hamming_index_probe",
        "pq_topk",
        "ann_index_topk",
        "epoch_shuffle",
        "mixture_weights",
        "perplexity",
        "profile_table",
        "shallow_clone",
        "check_constraints",
        "dv_delete",
        "dv_update",
        "generated_columns",
        "pipeline_e2e",
        "dv_merge",
        "semantic_dedup",
        "bm25_search",
        "keyword_search",
        "bigram_perplexity",
        "knn_graph",
        "identity_columns",
        "row_tracking",
        "cdf_datasource",
        "liquid_clustering",
        "type_widening",
        "v2_checkpoint",
        "encode_corpus",
        "sql_dml",
        "column_defaults",
        "create_table_ddl",
        "multimodal_decode",
        "gopher_quality",
        "kmeans_clusters",
        "streaming_window_counts",
        "streaming_sessionize",
        "streaming_dedup",
        "streaming_cdc_apply",
        "substring_dedup",
        "image_dedup",
        "audio_dedup",
        "audio_dedup_flac",
        "video_dedup",
        "column_mapping_id",
        "ivfpq_topk",
        "streaming_scd2",
        "interval_join",
        "merge_schema_evolution",
        "quality_dedup",
        "nested_evolution",
        "merge_full_sync",
        "decoder_override_dedup",
        "reorg_purge_manifest",
        "uniform_iceberg",
        "domain_cap",
        "dsir_weights",
        "log_cleanup",
        "fsck_crc_repair",
        "datasource_field_id",
        "heavy_hitters",
        "heavy_hitters_by_lang",
        "exact_quantiles",
        "quantiles_by_lang",
        "token_budget_selection",
    ]
    registry = entrymod.queries()
    timings: dict[str, float] = {}
    total = 0.0
    # fixed CALIBRATION workload (registry-independent, data-independent):
    # a pure-codegen aggregation over a generated range + a small shuffle.
    # Its cost depends only on the machine, so round-over-round drift in
    # "calibration" separates ambient machine slowdown from real query
    # regressions (VERDICT r7 item 3).
    # 5 samples: the JIT/shuffle floor settles around run 4 on an idle
    # machine (round-10 probe: 1.53/0.54/0.47/0.39/0.36/0.36) — a
    # 3-sample min over-reads the floor by ~15% and under-normalizes
    def _cal_cpu_once() -> float:
        t0 = time.time()
        spark.range(0, 20_000_000, 1, 32).selectExpr(
            "id % 97 as k", "id as v"
        ).groupBy("k").sum("v").count()
        return time.time() - t0

    cal_best = min(_cal_cpu_once() for _ in range(5))
    timings["calibration"] = round(cal_best, 3)
    # I/O calibration (round-10 continuation): the CPU/shuffle workload
    # above under-reads drift on the DML/streaming queries, whose cost
    # is dominated by table lifecycle I/O (write files, commit log,
    # read back). A bisect on a slow afternoon showed identical code
    # timing 1.5x apart across machine states while CPU calibration
    # moved only 13% — this lane makes that kind of drift self-evident
    # in the artifact. Diagnostic only: norm_factor stays CPU-based.
    def _cal_io_once() -> float:
        import shutil as _sh
        import tempfile as _tf

        from jodie_spark.tables.table import DeltaTable as _DT
        from jodie_spark.tables.table import write_delta as _wd

        _d = _tf.mkdtemp(prefix="bench_iocal_")
        try:
            t0 = time.time()
            _pp = os.path.join(_d, "t")
            _wd(spark.range(100_000).selectExpr("id", "id % 7 as k"), _pp)
            _t = _DT.forPath(spark, _pp)
            _t.delete("k = 3", deletion_vectors=True)
            _t.toDF().count()
            return time.time() - t0
        finally:
            _sh.rmtree(_d, ignore_errors=True)

    io_best = None
    try:
        io_best = min(_cal_io_once() for _ in range(3))
        timings["calibration_io"] = round(io_best, 3)
    except Exception:
        pass  # diagnostic lane must never fail the bench
    # Reference calibration cost on a QUIET machine (builder clean runs,
    # r8/r9: 0.30-0.35 s). norm_factor = CAL_REF / measured scales every
    # timing to quiet-machine terms, so an artifact captured on a loaded
    # box carries its own drift correction instead of reading as a
    # regression (VERDICT r9: the driver's r9 capture ran at 0.60 s
    # calibration and showed +28% that a clean re-run didn't reproduce).
    CAL_REF = 0.301
    norm_factor = min(CAL_REF / cal_best, 1.0) if cal_best > 0 else 1.0
    print(
        f"# calibration: {cal_best:.3f}s (quiet-machine ref {CAL_REF}s, "
        f"normalization x{norm_factor:.3f})",
        file=sys.stderr,
    )
    # Each query runs twice and the faster run is reported: the first
    # execution pays per-query whole-stage-codegen compilation and any
    # ambient machine noise; the min is the steady-state cost a warmed
    # cluster would see (fixture Delta-table builds are still inside
    # the timed region on both runs).
    # positional calibration (VERDICT r12 item 3): the artifact's tail
    # queries read up to ~2.3x their isolated cost when the machine's
    # I/O plane drifts mid-run — interleave CPU+IO calibration samples
    # at quartile positions so per-position drift is INDEXABLE in the
    # artifact instead of reading as a code regression. Diagnostic only:
    # excluded from total and from queries_normalized.
    positional_cal: list[dict] = []

    def _sample_position(idx: int, after: str) -> None:
        row: dict = {"index": idx, "after_query": after}
        try:
            row["cal_cpu_sec"] = round(min(_cal_cpu_once() for _ in range(2)), 3)
        except Exception as e:
            row["cal_cpu_sec"] = f"error: {e}"
        try:
            row["cal_io_sec"] = round(_cal_io_once(), 3)
        except Exception as e:
            row["cal_io_sec"] = f"error: {e}"
        positional_cal.append(row)
        print(
            f"# positional calibration after {after} (#{idx}): "
            f"cpu={row['cal_cpu_sec']} io={row['cal_io_sec']}",
            file=sys.stderr,
        )

    quartiles = {
        len(bench_queries) // 4,
        len(bench_queries) // 2,
        (3 * len(bench_queries)) // 4,
        len(bench_queries) - 1,
    }
    for qi, name in enumerate(bench_queries):
        fn = registry[name]
        best = None
        n = 0
        try:
            for _ in range(2):
                t0 = time.time()
                df = fn(spark, sf_dir)
                n = df.count()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            timings[name] = round(best, 3)
            total += best
            print(f"# {name}: {best:.2f}s ({n} rows)", file=sys.stderr)
        except Exception as e:  # a failed query scores as a long time, not a crash
            dt = time.time() - t0
            best = dt if best is None else best
            timings[name] = round(best, 3)
            total += best
            print(f"# {name}: FAILED after {dt:.2f}s: {e}", file=sys.stderr)
        if qi in quartiles:
            _sample_position(qi, name)

    # Phase profile for the historically most expensive query
    # (VERDICT r4 item 2): time centroid training, candidate-pair
    # generation, and the full dedup (election ≈ full − pairs).
    notes: dict = {}
    try:
        from jodie_spark.operators.ivf import train_centroids
        from jodie_spark.operators.semantic_dedup import (
            semantic_candidate_pairs,
            semantic_dedup,
        )

        aug = entrymod._planted_embeddings(spark, sf_dir)
        t0 = time.time()
        train_centroids(aug, "embedding", n_centroids=8)
        t_train = time.time() - t0
        t0 = time.time()
        n_pairs = semantic_candidate_pairs(
            aug, "embedding", "vec_id", n_clusters=8, threshold=0.9
        ).count()
        t_pairs = time.time() - t0
        t0 = time.time()
        semantic_dedup(aug, "embedding", "vec_id", n_clusters=8, threshold=0.9).count()
        t_full = time.time() - t0
        notes["semantic_dedup_phases"] = {
            "train_centroids_sec": round(t_train, 3),
            "candidate_pairs_sec": round(t_pairs, 3),
            "full_dedup_sec": round(t_full, 3),
            "election_sec_approx": round(max(t_full - t_pairs, 0.0), 3),
            "n_pairs": n_pairs,
        }
    except Exception as e:  # profiling must never fail the bench
        notes["semantic_dedup_phases"] = {"error": str(e)}

    # Streaming cost split (VERDICT r8 item 7): the streaming_* totals
    # are dominated by Python-datasource micro-batch machinery that is
    # a FIXED per-query cost (it amortizes across batches at scale).
    # Measure it once with a no-op stream — 2-row jodie_delta source →
    # memory sink, availableNow — and report each streaming query as
    # (total, marginal-over-noop) so round-over-round comparison sees
    # operator work, not harness startup.
    try:
        import tempfile as _tf2
        import uuid as _uuid2

        noop_src = os.path.join(_tf2.mkdtemp(prefix="jodie_noop_"), "t")
        spark.range(2).write.format("jodie_delta").mode("append").save(noop_src)
        noop_best = None
        for i in range(2):
            t0 = time.time()
            q = (
                spark.readStream.format("jodie_delta")
                .load(noop_src)
                .writeStream.format("memory")
                .queryName(f"bench_noop_{_uuid2.uuid4().hex[:6]}")
                .option(
                    "checkpointLocation",
                    os.path.join(_tf2.mkdtemp(prefix="jodie_noopck_"), "c"),
                )
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            dt = time.time() - t0
            noop_best = dt if noop_best is None else min(noop_best, dt)
        split = {"fixed_overhead_sec": round(noop_best, 3)}
        for name, t in timings.items():
            if name.startswith("streaming_"):
                split[name + "_marginal_sec"] = round(max(t - noop_best, 0.0), 3)
        notes["streaming_cost_split"] = split
    except Exception as e:
        notes["streaming_cost_split"] = {"error": str(e)}

    # Media codec throughput (VERDICT r9 item 7): the pure-Python
    # codecs are a THROUGHPUT ceiling, not a correctness issue — put a
    # number on it every round, next to the cost of routing around it
    # (decoder_overrides dispatch with a no-op external decoder, the
    # seam a libjpeg-turbo/ffmpeg deployment plugs into).
    try:
        import numpy as _np

        from jodie_spark.operators.codecs import (
            decode_image,
            encode_bmp,
            encode_jpeg,
            encode_png,
        )

        from jodie_spark.operators.codecs import encode_gif, encode_jpeg_progressive

        _rng = _np.random.default_rng(42)
        # GIF is palette-indexed (<=256 colors): random indexes into a
        # fixed 64-color palette
        _gif_pal = _rng.integers(0, 256, (64, 3), dtype=_np.uint8)
        _imgs = [
            _rng.integers(0, 256, (64, 48, 3), dtype=_np.uint8) for _ in range(64)
        ]
        # photo-like thumbnails (smooth gradients + texture): the fused
        # pair-LUT decode behaves differently on natural content than
        # on noise (higher pair-hit rate, fewer coefficients/block) —
        # report both content classes
        _yy, _xx = _np.mgrid[0:64, 0:48]
        _photos = [
            _np.stack(
                [
                    128 + 80 * _np.sin(_xx / 7.0 + s) + 20 * _np.cos(_yy / 5.0),
                    100 + 60 * _np.cos(_xx / 9.0) + 30 * _np.sin(_yy / 6.0 + s),
                    140 + 70 * _np.sin((_xx + _yy) / 8.0 + s),
                ],
                axis=2,
            ).clip(0, 255).astype(_np.uint8)
            for s in range(64)
        ]
        media = {}
        for label, blobs, overrides in (
            ("jpeg_pure_python", [encode_jpeg(p, quality=90) for p in _imgs], None),
            (
                "jpeg_photo_content",
                [encode_jpeg(p, quality=90) for p in _photos],
                None,
            ),
            (
                "jpeg_progressive",
                [encode_jpeg_progressive(p, quality=90) for p in _imgs],
                None,
            ),
            ("png_pure_python", [encode_png(p) for p in _imgs], None),
            ("bmp_pure_python", [encode_bmp(p) for p in _imgs], None),
            (
                "gif_pure_python",
                [
                    encode_gif(
                        _np.ascontiguousarray(
                            _gif_pal[_rng.integers(0, 64, (64, 48))]
                        )
                    )
                    for _ in range(64)
                ],
                None,
            ),
            (
                "jpeg_override_dispatch_noop",
                [encode_jpeg(p, quality=90) for p in _imgs],
                {"jpeg": lambda b: _imgs[0]},
            ),
        ):
            t0 = time.time()
            for b in blobs:
                decode_image(b, overrides=overrides) if overrides else decode_image(b)
            dt = max(time.time() - t0, 1e-9)
            media[label] = {
                "images_per_sec": round(len(blobs) / dt, 1),
                "mpix_per_sec": round(len(blobs) * 64 * 48 / dt / 1e6, 3),
            }
        media["note"] = (
            "per-core, 64x48 RGB; libjpeg-turbo decodes ~100-300 MPix/s/core "
            "(public benchmarks) vs the pure-Python JPEG path — route JPEG-"
            "heavy corpora through decoder_overrides at scale (SCALE.md)"
        )
        notes["media_decode_throughput"] = media
    except Exception as e:
        notes["media_decode_throughput"] = {"error": str(e)}

    # Full document (3-dp timings + phase notes) goes to a sidecar file;
    # stdout's FINAL line is a compact JSON document small enough to
    # survive the driver's tail capture (~2000 chars) intact, so the
    # official BENCH_r{N}.json artifact always parses (VERDICT r7 item
    # 2: r6/r7 artifacts had parsed=null with the front truncated).
    notes["positional_calibration"] = {
        "samples": positional_cal,
        "baseline": {
            "cal_cpu_sec": round(cal_best, 3),
            "cal_io_sec": round(io_best, 3) if io_best is not None else None,
        },
        "note": (
            "CPU+IO calibration interleaved at quartile positions of the "
            "query loop; compare each sample to the pre-run baseline to "
            "attribute tail-query movement to machine-state drift (this "
            "machine's documented failure mode) vs code"
        ),
    }
    # r13 measurement fix: both 2026-08-17 final captures showed the
    # SINGLE pre-run calibration sample catching a transient spike
    # (0.716 s / 1.114 s) while every in-run positional sample sat at
    # 0.30-0.46 s — a one-sample norm factor then OVER-normalizes the
    # whole artifact (59.3 s "normalized" from a 141.1 s raw run).
    # Use the median of {pre-run, positional} CPU samples instead: one
    # bursty sample, early or late, can no longer own the factor. The
    # pre-run single-sample factor stays in the notes for comparison.
    _cpu_samples = [cal_best] + [
        row["cal_cpu_sec"]
        for row in positional_cal
        if isinstance(row.get("cal_cpu_sec"), (int, float))
    ]
    _cpu_samples.sort()
    cal_median = _cpu_samples[len(_cpu_samples) // 2] if _cpu_samples else cal_best
    norm_factor_prerun = norm_factor
    norm_factor = min(CAL_REF / cal_median, 1.0) if cal_median > 0 else 1.0
    notes["calibration_normalization"] = {
        "cal_ref_sec": CAL_REF,
        "cal_measured_sec": round(cal_median, 3),
        "cal_prerun_sec": round(cal_best, 3),
        "norm_factor": round(norm_factor, 4),
        "norm_factor_prerun_only": round(norm_factor_prerun, 4),
        "note": (
            "normalized = raw * norm_factor; factor = CAL_REF / median of "
            "all CPU calibration samples (pre-run + positional), capped at "
            "1.0 so a faster-than-reference machine never inflates its "
            "numbers; median replaces the single pre-run sample (r13: two "
            "captures showed the pre-run sample catching transient spikes "
            "the in-run samples disprove)"
        ),
    }
    # run id ties the stdout line to the sidecar it describes — a
    # consumer following queries_full can detect a stale file from an
    # earlier run (e.g. when the sidecar write below fails)
    run_id = f"{int(time.time() * 1000):x}"
    full_doc = {
        "metric": "jodie_spark_bench_total",
        "run_id": run_id,
        "value": round(total, 3),
        "value_normalized": round(total * norm_factor, 3),
        "unit": "sec",
        "queries": timings,
        "queries_normalized": {
            k: round(v * norm_factor, 3)
            for k, v in timings.items()
            # both calibration lanes are raw diagnostics: CPU-scaling
            # the IO lane would cancel the drift it exists to expose
            if k not in ("calibration", "calibration_io")
        },
        "sf": sf,
        "notes": notes,
    }
    # r14 (VERDICT r13 item 1): each run also writes an immutable
    # per-run sidecar bench_full.<run_id>.json — reruns (e.g. the
    # driver's low-core scaling pass) previously clobbered the single
    # bench_full.json, destroying the per-query map of the run the
    # driver actually graded. queries_full names the exact per-run
    # file; bench_full.json stays as the latest-run convenience copy
    # (additions-only: stdout contract and existing fields unchanged).
    sidecar_ok = True
    run_sidecar = f"bench_full.{run_id}.json"
    _here = os.path.dirname(os.path.abspath(__file__))
    try:
        payload = json.dumps(full_doc, indent=1) + "\n"
        with open(os.path.join(_here, run_sidecar), "w", encoding="utf-8") as fh:
            fh.write(payload)
        with open(os.path.join(_here, "bench_full.json"), "w", encoding="utf-8") as fh:
            fh.write(payload)
    except OSError as e:  # sidecar is best-effort; the stdout line is the contract
        sidecar_ok = False
        print(f"# bench_full sidecars not written: {e}", file=sys.stderr)

    # The driver records only the LAST 2000 chars of stdout; a line
    # carrying all ~130 per-query timings overflows that capture and
    # every round's BENCH artifact lands with parsed=null (VERDICT r11
    # item 3). The contract split: the final stdout line stays SHORT
    # (always parses), and the full per-query map lives in
    # bench_full.json next to this script.
    compact = {
        "metric": "jodie_spark_bench_total",
        "value": round(total, 2),
        "value_normalized": round(total * norm_factor, 2),
        "norm_factor": round(norm_factor, 3),
        "unit": "sec",
        "queries": {
            k: round(timings[k], 2)
            for k in ("calibration", "calibration_io")
            if k in timings
        },
        "n_queries": sum(
            1 for k in timings if k not in ("calibration", "calibration_io")
        ),
        # null when the sidecar write failed — never point a consumer at
        # a stale file from an earlier run; run_id matches the sidecar's.
        # Points at the per-run immutable file so a later rerun cannot
        # clobber the map this line describes (VERDICT r13 item 1).
        "queries_full": run_sidecar if sidecar_ok else None,
        "run_id": run_id,
        "sf": sf,
    }
    print(json.dumps(compact, separators=(",", ":")))


if __name__ == "__main__":
    main()
