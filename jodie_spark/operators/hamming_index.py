"""Persisted hamming-band index: incremental NEAR-dup probes for any
64-bit similarity-preserving hash (text SimHash, image dHash/pHash,
audio loudness hashes).

Completes the incremental-dedup matrix: ``dedup_against`` / ``bloom``
answer the EXACT-identity question and ``minhash_index`` the fuzzy
TEXT question against a persisted corpus; this answers the fuzzy
MEDIA/SimHash question — "is this new image/audio/document within
hamming distance d of anything in the history?" — without recomputing
or reshuffling the history.

Same design as :mod:`jodie_spark.operators.minhash_index`:

- ``postings/`` Delta table, PARTITIONED BY band: (band, key, id, h) —
  the hash banded into equal bit-slices; by pigeonhole any pair at
  hamming ≤ bands-1 shares at least one band key (the same recall
  guarantee ``hamming_dedup`` relies on, text_dedup.py:540).
- geometry (bands, max_hamming default) persisted as table
  properties — self-describing, probes refuse on mismatch.
- probe: the new batch's banded keys BROADCAST into the postings
  scan; the verify (``bit_count(xor) <= d``) runs in whole-stage
  codegen on the join output; the only non-broadcast exchange is the
  final distinct over the tiny match set.
- growth: append new rows' postings, no rebuild, Delta-atomic.

Unlike minhash_index no separate signature table is needed — the full
64-bit hash rides along in each posting row (8 bytes), so the verify
is local to the join."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_PROP_BANDS = "jodie.hamming.bands"

_POSTINGS = "postings"


def _postings_path(index_path: str) -> str:
    from jodie_spark.fs import get_fs

    return get_fs(index_path).join(index_path, _POSTINGS)


def _banded_keys(hash_col: Column, bands: int) -> Column:
    bits_per = 64 // bands
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftrightunsigned(hash_col, b * bits_per)
                .bitwiseAND(F.lit((1 << bits_per) - 1))
                .alias("key"),
            )
            for b in range(bands)
        ]
    )


def _postings_df(df: DataFrame, hash_col: str, id_col: str, bands: int) -> DataFrame:
    return df.select(
        F.col(id_col).alias("id"),
        F.col(hash_col).cast("long").alias("h"),
        F.explode(_banded_keys(F.col(hash_col).cast("long"), bands)).alias("bk"),
    ).select(F.col("bk.band").alias("band"), F.col("bk.key").alias("key"), "id", "h")


def build_hamming_index(
    df: DataFrame,
    hash_col: str,
    id_col: str,
    index_path: str,
    bands: int = 4,
    mode: str = "error",
) -> None:
    """One pass over (id, hash) → banded postings. ``bands`` bounds
    recall: pairs at hamming ≤ bands-1 are ALWAYS candidates; beyond
    that recall degrades (pigeonhole). Not partitioned by band: probes
    join on (band, key) across ALL bands (no pruning to buy) and a
    band-partitioned append writes ×bands small files per batch
    (guide §6.2)."""
    if bands < 2 or 64 % bands:
        # bands=1 would need a 64-bit all-ones mask (Long overflow) and
        # means "exact hash match only"; negatives would silently build
        # an EMPTY index (range(-n) is empty) — both refused loudly
        raise ValueError(f"bands={bands} must divide 64 and be >= 2")
    from jodie_spark.tables.table import write_delta

    write_delta(
        _postings_df(df, hash_col, id_col, bands),
        _postings_path(index_path),
        mode=mode,
        options={_PROP_BANDS: str(bands)},
    )


def _index_bands(spark: SparkSession, index_path: str) -> int:
    from jodie_spark.tables.table import DeltaTable

    cfg = DeltaTable.forPath(spark, _postings_path(index_path)).snapshot().configuration
    if _PROP_BANDS not in cfg:
        raise ValueError(
            f"{index_path!r} is not a hamming index (missing {_PROP_BANDS}) — "
            "build one with build_hamming_index"
        )
    return int(cfg[_PROP_BANDS])


def append_to_hamming_index(
    df: DataFrame, hash_col: str, id_col: str, index_path: str
) -> None:
    """Grow the index — an append using the PERSISTED band count."""
    from jodie_spark.tables.table import write_delta

    bands = _index_bands(df.sparkSession, index_path)
    write_delta(
        _postings_df(df, hash_col, id_col, bands),
        _postings_path(index_path),
        mode="append",
    )


def query_hamming_index(
    spark: SparkSession,
    index_path: str,
    df: DataFrame,
    hash_col: str,
    id_col: str,
    max_hamming: int = 3,
) -> DataFrame:
    """Matches ``(new_id, index_id, hamming)`` of the new batch against
    the indexed history at ``bit_count(xor) <= max_hamming``. Full
    recall is guaranteed for ``max_hamming <= bands - 1``; a larger
    radius is allowed but partial-recall (pigeonhole), so it warns."""
    from jodie_spark.tables.table import DeltaTable

    # one log replay: the snapshot serves both the band-count property
    # and the postings read
    pt = DeltaTable.forPath(spark, _postings_path(index_path))
    psnap = pt.snapshot()
    cfg = psnap.configuration
    if _PROP_BANDS not in cfg:
        raise ValueError(
            f"{index_path!r} is not a hamming index (missing {_PROP_BANDS}) — "
            "build one with build_hamming_index"
        )
    bands = int(cfg[_PROP_BANDS])
    if max_hamming > bands - 1:
        import warnings

        warnings.warn(
            f"max_hamming={max_hamming} exceeds the index's guaranteed "
            f"radius bands-1={bands - 1}: matches beyond {bands - 1} bits "
            "may be missed (pigeonhole recall bound)",
            UserWarning,
            stacklevel=2,
        )
    postings = pt.toDF(_snapshot=psnap)
    batch = F.broadcast(
        df.select(
            F.col(id_col).alias("new_id"),
            F.col(hash_col).cast("long").alias("new_h"),
            F.explode(
                _banded_keys(F.col(hash_col).cast("long"), bands)
            ).alias("bk"),
        ).select("new_id", "new_h", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    )
    return (
        postings.join(batch, ["band", "key"])
        .withColumn(
            "hamming",
            F.bit_count(F.col("new_h").bitwiseXOR(F.col("h"))).cast("int"),
        )
        .filter(F.col("hamming") <= F.lit(int(max_hamming)))
        .select("new_id", F.col("id").alias("index_id"), "hamming")
        .distinct()
    )


def hamming_index_filter_new(
    spark: SparkSession,
    index_path: str,
    df: DataFrame,
    hash_col: str,
    id_col: str,
    max_hamming: int = 3,
) -> DataFrame:
    """Rows of ``df`` with NO near-dup in the index — the incremental
    media-dedup direction (compose with ``with_image_dhash`` /
    ``with_audio_hash`` / ``simhash`` to go from raw bytes to hashes)."""
    matches = (
        query_hamming_index(spark, index_path, df, hash_col, id_col, max_hamming)
        .select(F.col("new_id").alias(id_col))
        .distinct()
    )
    return df.join(matches, [id_col], "left_anti")
