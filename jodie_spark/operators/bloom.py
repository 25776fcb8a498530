"""Broadcast Bloom-filter membership for incremental dedup at scale.

``dedup_against`` (text_dedup.py) anti-joins a new batch against the
seen-fingerprint set — exact, but at 100 TB the seen side is billions
of rows and every incremental batch pays a shuffle of both sides. A
Bloom filter built once over the seen fingerprints turns each batch's
check into a MAP-SIDE broadcast test: zero shuffle at query time, the
whole seen set compressed to ``n_bits/8`` bytes. Bloom semantics are
the right trade for crawl/corpus dedup: false NEGATIVES never happen
(a seen document is always flagged seen, so duplicates never leak
through), false positives drop a tunable sliver of genuinely-new
documents (~0.1% at the defaults) — acceptable where re-emitting seen
data is the expensive failure.

Engine-portable by construction (the same discipline as
``operators/sampling.py``): bit positions come from md5 hex arithmetic
that Spark and any ANSI engine evaluate identically —

    h  = md5(value)                       (32 hex chars)
    h1 = int(h[0:13], 16)                 (52 bits, exact in BIGINT)
    h2 = int(h[16:29], 16) | 1            (odd stride = full period)
    pos_i = (h1 + i * h2) mod n_bits      (Kirsch-Mitzenmacher double
                                           hashing, i in [0, n_hashes))

so the DuckDB oracle reproduces membership — including the false
positives — bit for bit.

Scale shape:
- **build**: positions computed JVM-side (md5/conv in codegen), bits
  set per partition in numpy over Arrow batches, per-partition bitmaps
  OR-reduced. One scan, no shuffle. Driver holds
  ``n_partitions × n_bits/8`` transiently; for thousand-partition
  scans pass ``combine_partitions`` to coalesce the bitmap stage (the
  scan stays wide, only the tiny bitmap rows funnel).
- **probe**: the bitmap ships once per executor via a Spark broadcast;
  membership is a vectorized numpy gather inside an Arrow-batched
  pandas_udf. No join, no shuffle, no per-row Python.

The reference has no counterpart (its dedup surface is
DeltaHelpers.scala:243-330, all exact); this extends the incremental
dedup family (`dedup_against`, `exact_dedup`) with the
constant-memory probe a 100 TB pipeline needs.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: 13 hex chars = 52 bits: exact in signed BIGINT and in DOUBLE, with
#: headroom for (h1 + n_hashes * h2) to stay under 2^63
_HEX_SPAN = 13

DEFAULT_N_BITS = 1 << 23  # 1 MiB bitmap
DEFAULT_N_HASHES = 7

#: Above this bitmap size the "broadcast once per executor" premise
#: stops being comfortable (Spark's broadcast plumbing tops out well
#: before the torrent blocks do — multi-GiB broadcasts evict executor
#: storage memory and serialize per-executor fetches). The guard only
#: WARNS: the build still runs, but users sizing for 100 TB should
#: switch structures instead (see :func:`check_broadcast_budget`).
BROADCAST_BUDGET_BYTES = 1 << 30  # 1 GiB


def check_broadcast_budget(
    n_bits: int, budget_bytes: int | None = BROADCAST_BUDGET_BYTES
) -> None:
    """Warn when the bitmap outgrows broadcast practicality.

    The arithmetic (SCALE.md "Bloom broadcast ceiling"): at fpp p the
    bitmap is ``m = -n·ln p / ln²2`` bits, so a byte budget B caps the
    seen-set size at ``n_max = -8·B·ln²2 / ln p`` — for B = 1 GiB and
    p = 1e-3 that is ≈ 6.0e8 items; at n = 1e10 / p = 1e-3 the bitmap
    is ≈ 18 GB, far past executor broadcast comfort. Beyond the budget
    the right tools are the persisted probe indexes
    (``minhash_index_filter_new`` / ``hamming_index_filter_new`` —
    partition-pruned postings probes, no broadcast of the seen set) or
    exact ``dedup_against`` (anti-join, shuffles but never lies).
    """
    if budget_bytes is None:
        return
    n_bytes = n_bits // 8
    if n_bytes > budget_bytes:
        import warnings

        warnings.warn(
            f"Bloom bitmap is {n_bytes / 2**30:.1f} GiB "
            f"(> broadcast budget {budget_bytes / 2**30:.1f} GiB): "
            "broadcasting it per executor will strain Spark's broadcast "
            "layer. For seen sets this large use the persisted probe "
            "indexes (minhash_index_filter_new / hamming_index_filter_new) "
            "or exact dedup_against instead; raise budget_bytes only if "
            "the cluster's executors genuinely have the headroom.",
            ResourceWarning,
            stacklevel=3,
        )


class BloomFilter:
    """Immutable fingerprint-set sketch: ``bits`` (bytes, little-endian
    bit order within each byte), plus the (n_bits, n_hashes) geometry
    a probe must match."""

    def __init__(self, bits: bytes, n_bits: int, n_hashes: int, n_items: int = 0):
        if len(bits) * 8 != n_bits:
            raise ValueError(f"bitmap is {len(bits)} bytes, expected {n_bits // 8}")
        self.bits = bytes(bits)
        self.n_bits = int(n_bits)
        self.n_hashes = int(n_hashes)
        self.n_items = int(n_items)

    @property
    def fill_ratio(self) -> float:
        return float(np.unpackbits(np.frombuffer(self.bits, np.uint8)).mean())

    @property
    def expected_fpp(self) -> float:
        """fpp = fill_ratio ** n_hashes (standard Bloom estimate using
        the MEASURED fill instead of the n/m approximation)."""
        return self.fill_ratio ** self.n_hashes

    def __contains__(self, value: str) -> bool:
        """Driver-side single probe (tests / spot checks)."""
        import hashlib

        h = hashlib.md5(str(value).encode("utf-8")).hexdigest()
        h1 = int(h[:_HEX_SPAN], 16)
        h2 = int(h[16:16 + _HEX_SPAN], 16) | 1
        arr = np.frombuffer(self.bits, np.uint8)
        for i in range(self.n_hashes):
            pos = (h1 + i * h2) % self.n_bits
            if not (arr[pos >> 3] >> (pos & 7)) & 1:
                return False
        return True


def bloom_positions(col: Column, n_bits: int, n_hashes: int) -> Column:
    """Array of ``n_hashes`` bit positions for ``col`` — pure codegen
    (md5 + conv + pmod), the arithmetic the module docstring pins."""
    h = F.md5(col.cast("string"))
    h1 = F.conv(F.substring(h, 1, _HEX_SPAN), 16, 10).cast("long")
    # substring is 1-based: chars 17..29 = h[16:29]
    h2 = F.conv(F.substring(h, 17, _HEX_SPAN), 16, 10).cast("long")
    h2 = (h2.bitwiseOR(F.lit(1))).cast("long")
    arr = F.array(
        *[F.pmod(h1 + F.lit(i) * h2, F.lit(n_bits)) for i in range(n_hashes)]
    )
    # NULL input → NULL ARRAY (not an array of NULL elements), so both
    # the build filter and the probe's positions-is-None path fire
    return F.when(col.isNotNull(), arr)


def build_bloom(
    df: DataFrame,
    col: str,
    n_bits: int = DEFAULT_N_BITS,
    n_hashes: int = DEFAULT_N_HASHES,
    combine_partitions: int | None = None,
    broadcast_budget_bytes: int | None = BROADCAST_BUDGET_BYTES,
) -> BloomFilter:
    """One-scan distributed Bloom build over ``df[col]``.

    Positions are computed JVM-side; each Arrow batch sets its bits in
    a per-partition numpy bitmap; the driver ORs the per-partition
    bitmaps. NULL values are skipped (a NULL fingerprint is not a
    document identity). ``combine_partitions`` coalesces the bitmap
    stage for very wide scans (bounds driver transient memory to
    ``combine_partitions * n_bits / 8``).
    """
    if n_bits % 8:
        raise ValueError(f"n_bits must be a multiple of 8, got {n_bits}")
    if n_hashes < 1:
        raise ValueError(f"n_hashes must be >= 1, got {n_hashes}")
    check_broadcast_budget(n_bits, broadcast_budget_bytes)
    pos_df = df.select(
        bloom_positions(F.col(col), n_bits, n_hashes).alias("__pos__")
    ).filter(F.col("__pos__").isNotNull())
    if combine_partitions:
        pos_df = pos_df.coalesce(int(combine_partitions))

    n_bytes = n_bits // 8

    def _bitmaps(batches):
        # one pass yields both the bitmap AND the item count — a
        # separate count() would be a second full scan of the seen set
        bitmap = np.zeros(n_bytes, np.uint8)
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            n += len(pdf)
            pos = np.concatenate(pdf["__pos__"].to_numpy()).astype(np.int64)
            np.bitwise_or.at(bitmap, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        if n:
            import pandas as pd

            yield pd.DataFrame({"bitmap": [bitmap.tobytes()], "n": [n]})

    parts = pos_df.mapInPandas(_bitmaps, "bitmap binary, n long").collect()
    out = np.zeros(n_bytes, np.uint8)
    n_items = 0
    for row in parts:
        out |= np.frombuffer(row["bitmap"], np.uint8)
        n_items += row["n"]
    return BloomFilter(out.tobytes(), n_bits, n_hashes, n_items)


def optimal_geometry(
    n_items: int,
    fpp: float = 1e-3,
    broadcast_budget_bytes: int | None = BROADCAST_BUDGET_BYTES,
) -> tuple[int, int]:
    """(n_bits, n_hashes) sized for ``n_items`` at ``fpp`` — the
    textbook m = -n ln p / ln^2 2, k = m/n ln 2, n_bits rounded up to
    a byte multiple.

    ``broadcast_budget_bytes`` takes the same override ``build_bloom``
    does (None disables the warning) so a caller who deliberately
    raised the budget is not re-warned at sizing time with the default
    they already opted out of (ADVICE r11)."""
    if n_items < 1:
        n_items = 1
    m = int(math.ceil(-n_items * math.log(fpp) / (math.log(2) ** 2)))
    m = (m + 7) // 8 * 8
    k = max(1, int(round(m / n_items * math.log(2))))
    # warn at sizing time, not just at build
    check_broadcast_budget(m, broadcast_budget_bytes)
    return m, k


def bloom_filter_new(
    df: DataFrame,
    bloom: BloomFilter,
    col: str,
    keep: str = "new",
) -> DataFrame:
    """Filter ``df`` by Bloom membership of ``df[col]``.

    ``keep='new'`` keeps rows whose value is definitely NOT in the
    seen set (the incremental-dedup direction: no seen row survives;
    ~fpp of new rows are dropped as collateral). ``keep='seen'`` keeps
    the probable members (audit direction). NULL values test as new.

    The bitmap rides a Spark broadcast (one copy per executor); the
    probe is a numpy gather per Arrow batch — no shuffle, no join.
    """
    if keep not in ("new", "seen"):
        raise ValueError(f"keep must be 'new' or 'seen', got {keep!r}")
    sc = df.sparkSession.sparkContext
    bc = sc.broadcast(bloom.bits)
    n_bits, n_hashes = bloom.n_bits, bloom.n_hashes

    @F.pandas_udf("boolean")
    def _member(pos_arrays):
        import pandas as pd

        arr = np.frombuffer(bc.value, np.uint8)
        out = np.zeros(len(pos_arrays), bool)
        for j, positions in enumerate(pos_arrays):
            if positions is None:
                continue
            pos = np.asarray(positions, np.int64)
            out[j] = bool(((arr[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1).all())
        return pd.Series(out)

    member = _member(bloom_positions(F.col(col), n_bits, n_hashes))
    return df.filter(member if keep == "seen" else ~member)


def bloom_oracle_sql_positions(expr: str, n_bits: int, n_hashes: int) -> str:
    """DuckDB expression producing the SAME position list as
    :func:`bloom_positions` — kept next to the Spark arithmetic so the
    two can only drift together. Returns a SQL list literal expression
    over ``expr`` (a string-typed SQL expression)."""
    h1 = f"CAST(('0x' || substr(md5({expr}), 1, {_HEX_SPAN})) AS UBIGINT)::BIGINT"
    h2 = (
        f"(CAST(('0x' || substr(md5({expr}), 17, {_HEX_SPAN})) AS UBIGINT)::BIGINT | 1)"
    )
    items = ", ".join(f"(({h1}) + {i} * ({h2})) % {n_bits}" for i in range(n_hashes))
    return f"[{items}]"
