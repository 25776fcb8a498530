"""Document deduplication at training-data scale: exact, MinHash-LSH,
SimHash, and n-gram-Jaccard.

Scale contract (the design constraint for every operator here): **no
all-pairs stage, ever**. Candidate pairs come from hash-bucket joins
(LSH bands / SimHash bands / fingerprint equality), so the shuffle key
is always a bucket id and the worst case is quadratic only *within a
bucket*, never across the corpus. Signatures are computed with
``xxhash64``/``transform``/``aggregate`` — JVM-side, codegen-friendly,
no Python UDFs in any hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from jodie_spark.functions.text import doc_fingerprint
from jodie_spark.functions.vectors import cosine_similarity, random_hyperplane_signature

# ---------------------------------------------------------------------------
# exact / near-exact
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the lowest-id document per *normalized-content* fingerprint
    (case/whitespace-insensitive md5). One hash shuffle."""
    w = Window.partitionBy("__fp__").orderBy(F.col(id_col))
    return (
        df.withColumn("__fp__", doc_fingerprint(F.col(text_col)))
        .withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .drop("__fp__", "__rn__")
    )


# ---------------------------------------------------------------------------
# shingling + MinHash
# ---------------------------------------------------------------------------

def _word_tokens(col: Column) -> Column:
    return F.filter(F.split(F.lower(col), r"[^\p{L}\p{N}]+"), lambda w: F.length(w) > 0)


def shingles(col: Column, n: int = 5) -> Column:
    """Distinct word ``n``-grams; documents shorter than ``n`` words
    yield one shingle (all their words)."""
    words = _word_tokens(col)
    k = F.size(words)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(k - n + 1, F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(words, i, n)),
    )
    return F.array_distinct(grams)


def minhash_signature(shingle_col: Column, num_hashes: int = 64) -> Column:
    """MinHash signature: per seed, the min xxhash64 over shingles.
    Equal signature positions estimate Jaccard similarity (the classic
    Broder construction)."""
    return F.array(
        *[
            F.array_min(F.transform(shingle_col, lambda s, i=i: F.xxhash64(s, F.lit(i))))
            for i in range(num_hashes)
        ]
    )


def _banded(sig_col: Column, num_hashes: int, bands: int) -> Column:
    """Array of (band_id, band_hash) structs; docs agreeing on any full
    band become bucket-mates (LSH banding)."""
    rows = num_hashes // bands
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(F.slice(sig_col, b * rows + 1, rows)).alias("bucket"),
            )
            for b in range(bands)
        ]
    )


def minhash_candidate_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_size: int = 5,
) -> DataFrame:
    """Candidate near-duplicate pairs ``(id_a, id_b)`` with ``id_a <
    id_b``: documents sharing at least one LSH band bucket. The join is
    a self-equi-join on (band, bucket) — shuffle on bucket id only."""
    sigs = (
        df.select(F.col(id_col).alias("id"), shingles(F.col(text_col), shingle_size).alias("sh"))
        .withColumn("sig", minhash_signature(F.col("sh"), num_hashes))
        .withColumn("bb", F.explode(_banded(F.col("sig"), num_hashes, bands)))
        .select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    )
    a = sigs.alias("a")
    b = sigs.alias("b")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def minhash_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_size: int = 5,
) -> DataFrame:
    """Drop documents that share an LSH band bucket with a lower-id
    document (single-pass representative election: per bucket, the min
    id survives; chains longer than one hop need iteration and are
    deliberately out of scope for one pass)."""
    sigs = (
        df.withColumn("__sh__", shingles(F.col(text_col), shingle_size))
        .withColumn("__sig__", minhash_signature(F.col("__sh__"), num_hashes))
        .withColumn("__bb__", F.explode(_banded(F.col("__sig__"), num_hashes, bands)))
    )
    w = Window.partitionBy("__bb__.band", "__bb__.bucket")
    survivors = (
        sigs.withColumn("__min_id__", F.min(F.col(id_col)).over(w))
        .groupBy(id_col)
        .agg(F.min("__min_id__").alias("__rep__"))
        .filter(F.col(id_col) == F.col("__rep__"))
        .select(id_col)
    )
    return df.join(survivors, id_col, "left_semi")


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.8,
    shingle_size: int = 5,
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Exact-Jaccard-verified near-duplicate pairs: LSH candidates
    (bounded), then ``|A∩B| / |A∪B|`` on the true shingle sets. Returns
    (id_a, id_b, jaccard ≥ threshold)."""
    cands = minhash_candidate_pairs(df, text_col, id_col, num_hashes, bands, shingle_size)
    sh = df.select(
        F.col(id_col).alias("id"), shingles(F.col(text_col), shingle_size).alias("sh")
    )
    return (
        cands.join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(col: Column, bits: int = 64) -> Column:
    """Charikar SimHash over word tokens: per bit position, the sign of
    the ±1 vote sum across word hashes, packed into a long. One pass
    over the token array (per-word bit votes via ``transform``, vote
    sums via a single ``aggregate``) — stays on the JVM. Bit positions
    are unrolled as Python ints because shift amounts must be literals.
    """
    words = _word_tokens(col)
    bit_votes = F.transform(
        words,
        lambda w: F.array(
            *[
                F.when(
                    F.shiftright(F.xxhash64(w), i).bitwiseAND(F.lit(1)) == 1, F.lit(1)
                )
                .otherwise(F.lit(-1))
                .cast("long")
                for i in range(bits)
            ]
        ),
    )
    counts = F.aggregate(
        bit_votes,
        F.array_repeat(F.lit(0).cast("long"), bits),
        lambda acc, b: F.zip_with(acc, b, lambda x, y: x + y),
    )
    return _pack_sign_bits(counts, bits)


def _pack_sign_bits(counts: Column, bits: int) -> Column:
    """Pack sign(counts[i]) into bit i of a long. Reference ``counts``
    via a materialized column (see :func:`simhash_dedup`) to avoid
    duplicating a large expression tree ``bits`` times."""
    sig = F.lit(0).cast("long")
    for i in range(bits):
        sig = sig.bitwiseOR(
            F.when(
                F.element_at(counts, i + 1) > 0, F.shiftleft(F.lit(1).cast("long"), i)
            ).otherwise(F.lit(0).cast("long"))
        )
    return sig


def simhash_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Near-dup removal by SimHash: band the 64-bit hash into ``bands``
    16-bit keys (pigeonhole: hamming ≤ bands-1 ⇒ at least one band
    equal), bucket-join, verify ``bit_count(xor) ≤ max_hamming``, drop
    the higher id of each verified pair."""
    bits_per = 64 // bands
    words = _word_tokens(F.col(text_col))
    bit_votes = F.transform(
        words,
        lambda w: F.array(
            *[
                F.when(F.shiftright(F.xxhash64(w), i).bitwiseAND(F.lit(1)) == 1, F.lit(1))
                .otherwise(F.lit(-1))
                .cast("long")
                for i in range(64)
            ]
        ),
    )
    counts = F.aggregate(
        bit_votes,
        F.array_repeat(F.lit(0).cast("long"), 64),
        lambda acc, b: F.zip_with(acc, b, lambda x, y: x + y),
    )
    h = (
        df.select(F.col(id_col).alias("id"), counts.alias("__cnt__"))
        .select("id", _pack_sign_bits(F.col("__cnt__"), 64).alias("sh"))
    )
    banded = h.select(
        "id", "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("sh"), b * bits_per)
                        .bitwiseAND(F.lit((1 << bits_per) - 1))
                        .alias("key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "sh", "bk.band", "bk.key")
    a, b = banded.alias("a"), banded.alias("b")
    dup_ids = (
        a.join(b, ["band", "key"])
        .filter(F.col("a.id") < F.col("b.id"))
        .filter(F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh"))) <= max_hamming)
        .select(F.col("b.id").alias("id"))
        .distinct()
    )
    return df.join(dup_ids.withColumnRenamed("id", id_col), id_col, "left_anti")


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------

def embedding_dedup(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 16,
    n_tables: int = 2,
) -> DataFrame:
    """Embedding near-duplicate removal: sign-random-projection buckets
    (``n_tables`` independent hyperplane sets to cut misses), exact
    cosine verification within buckets, drop the higher id of each pair
    with similarity ≥ threshold."""
    keyed = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    for tbl in range(n_tables):
        keyed = keyed.withColumn(
            f"__sig{tbl}__",
            random_hyperplane_signature(F.col("v"), dim, n_planes, seed=42 + tbl),
        )
    pairs = None
    for tbl in range(n_tables):
        a = keyed.alias("a")
        b = keyed.alias("b")
        p = (
            a.join(b, F.col(f"a.__sig{tbl}__") == F.col(f"b.__sig{tbl}__"))
            .filter(F.col("a.id") < F.col("b.id"))
            .select(
                F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                F.col("a.v").alias("v_a"), F.col("b.v").alias("v_b"),
            )
        )
        pairs = p if pairs is None else pairs.unionByName(p)
    dup_ids = (
        pairs.distinct()
        .withColumn("sim", cosine_similarity(F.col("v_a"), F.col("v_b")))
        .filter(F.col("sim") >= threshold)
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return df.join(dup_ids, id_col, "left_anti")
