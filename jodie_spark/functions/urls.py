"""URL analysis for web-scale corpus curation: host/domain extraction
and domain-based allow/block filtering.

All extraction is ``regexp_extract`` over an explicit pattern (full
whole-stage codegen) rather than ``F.parse_url`` — the explicit regex
has identical semantics in DuckDB's RE2, so every function here is
value-checkable by a SQL oracle, and it never throws on malformed
URLs (returns NULL instead, which ``parse_url`` only offers via
``try_parse_url`` in Spark 4).

Domain filtering broadcasts the list side: a blocklist is small
(10³-10⁷ domains — MBs) next to a 100 TB corpus, so the anti-join
must never shuffle the corpus. ``filter_by_domain`` wraps the list in
``F.broadcast`` explicitly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# scheme://host[:port]/...  — host stops at '/', '?', '#', or ':'.
# Kept alternation-free so Java regex and RE2 agree exactly.
_HOST_PATTERN = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)"
_PATH_PATTERN = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)"


def url_host(col: Column) -> Column:
    """Lower-cased host of a URL (NULL when ``col`` has no
    ``scheme://host`` prefix)."""
    h = F.regexp_extract(col, _HOST_PATTERN, 1)
    return F.when(h != "", F.lower(h))


def url_path(col: Column) -> Column:
    """Path component ('/a/b' of 'https://x.com/a/b?q=1'); NULL when
    absent."""
    p = F.regexp_extract(col, _PATH_PATTERN, 1)
    return F.when(p != "", p)


def url_domain(col: Column) -> Column:
    """Registrable-domain heuristic: the last two dot-labels of the
    host ('sub.news.example.com' → 'example.com'). A true public
    suffix list (co.uk, com.au, ...) needs an external dataset; for
    those TLDs this returns the suffix+1 label short. Deterministic
    and cheap — the right default for corpus-level grouping."""
    host = url_host(col)
    parts = F.split(host, r"\.")
    n = F.size(parts)
    return F.when(host.isNull(), F.lit(None).cast("string")).otherwise(
        F.when(n <= 2, host).otherwise(
            F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
        )
    )


def with_url_parts(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Add ``host`` / ``domain`` / ``path`` columns in one projection."""
    c = F.col(url_col)
    return df.withColumns(
        {"host": url_host(c), "domain": url_domain(c), "path": url_path(c)}
    )


def filter_by_domain(
    df: DataFrame,
    domains: DataFrame | Sequence[str],
    url_col: str = "url",
    mode: str = "block",
) -> DataFrame:
    """Filter rows by the registrable domain of ``url_col``.

    ``mode='block'`` drops rows whose domain is in ``domains``
    (rows with un-parseable URLs are kept); ``mode='allow'`` keeps
    only rows whose domain matches. ``domains`` is a list of strings
    or a single-column DataFrame; either way it is broadcast, so the
    corpus side never shuffles.
    """
    if mode not in ("block", "allow"):
        raise ValueError(f"mode must be 'block' or 'allow', got {mode!r}")
    spark = df.sparkSession
    if isinstance(domains, DataFrame):
        dom_df = domains.toDF("__domain__")
    else:
        dom_df = spark.createDataFrame([(d.lower(),) for d in domains], ["__domain__"])
    tagged = df.withColumn("__d__", url_domain(F.col(url_col)))
    how = "left_anti" if mode == "block" else "left_semi"
    out = tagged.join(
        F.broadcast(dom_df), tagged["__d__"] == dom_df["__domain__"], how
    )
    return out.drop("__d__")


def cap_per_domain(
    df: DataFrame,
    url_col: str = "url",
    k: int = 100,
    id_col: str = "doc_id",
    quality_col: str | None = None,
    salt_partitions: int = 32,
) -> DataFrame:
    """Frequency capping: keep at most ``k`` documents per registrable
    domain — the C4/RefinedWeb-style guard against a single site
    dominating the corpus. Survivors are the ``k`` best by
    ``quality_col`` (descending, ties → lowest id) when given, else
    the ``k`` lowest ids; rows with un-parseable URLs are always kept
    (no domain to cap).

    100 TB shape: a naive ``row_number() OVER (PARTITION BY domain)``
    puts every row of a hot domain in ONE task — a crawl's top domain
    can be 1% of the corpus, so that's a straggler/OOM. Instead the
    election is a two-stage EXACT top-k over a narrow (domain, order
    keys, id) projection: stage 1 ranks within (domain, salt) — each
    partition holds ~1/``salt_partitions`` of the domain — and keeps
    per-salt top-k; stage 2 ranks the ≤ salt_partitions·k survivors
    per domain (bounded rows per partition by construction). Every
    global top-k row is in its salt's top-k, so the composition is
    exact. The heavy text column never enters either shuffle: keepers
    semi-join back by id."""
    from pyspark.sql import Window

    dom = url_domain(F.col(url_col))
    narrow = df.select(
        F.col(id_col).alias("__id__"),
        dom.alias("__dom__"),
        *(
            [F.col(quality_col).cast("double").alias("__q__")]
            if quality_col
            else []
        ),
    ).filter(F.col("__dom__").isNotNull())
    order = (
        [F.col("__q__").desc_nulls_last(), F.col("__id__").asc()]
        if quality_col
        else [F.col("__id__").asc()]
    )
    salt = (F.xxhash64(F.col("__id__")) % salt_partitions).cast("int")
    w1 = Window.partitionBy("__dom__", "__salt__").orderBy(*order)
    stage1 = (
        narrow.withColumn("__salt__", salt)
        .withColumn("__rn__", F.row_number().over(w1))
        .filter(F.col("__rn__") <= k)
        .drop("__rn__", "__salt__")
    )
    w2 = Window.partitionBy("__dom__").orderBy(*order)
    keepers = (
        stage1.withColumn("__rn__", F.row_number().over(w2))
        .filter(F.col("__rn__") <= k)
        .select(F.col("__id__").alias(id_col))
    )
    uncapped = df.filter(dom.isNull())
    return df.join(keepers, id_col, "left_semi").unionByName(uncapped)
