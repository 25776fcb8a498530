"""Text analysis for training-data pipelines: token counting, quality
scoring, language ID, fingerprinting.

Every function here returns a Spark ``Column`` built purely from
``pyspark.sql.functions`` — the whole pipeline stays inside
whole-stage codegen (no Python in the hot path), so these run at
full scan speed over 100 TB of documents.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Small high-frequency word lists per language for the n-gram/stopword
# language heuristic. Deliberately tiny: the score is the fraction of a
# document's tokens found in each list; ties/no-hits → 'und'.
_LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for",
           "with", "as", "on", "are", "this", "be", "at", "have", "not", "from"],
    "de": ["der", "die", "das", "und", "ist", "von", "nicht", "mit", "ein",
           "eine", "zu", "den", "auf", "für", "im", "dem", "sich", "des", "auch", "es"],
    "fr": ["le", "la", "les", "et", "est", "de", "des", "un", "une", "du",
           "que", "qui", "dans", "pour", "pas", "sur", "au", "avec", "ne", "ce"],
    "es": ["el", "la", "los", "las", "y", "es", "de", "del", "un", "una",
           "que", "en", "no", "por", "con", "para", "se", "su", "al", "como"],
}


def _words(col: Column) -> Column:
    """Lower-cased word tokens (non-letter boundaries)."""
    return F.filter(
        F.split(F.lower(col), r"[^\p{L}]+"), lambda w: F.length(w) > 0
    )


def ws_tokens(col: Column, lowercase: bool = True) -> Column:
    """Whitespace tokens of trimmed text (empty array for blank text).
    The same tokenization a DuckDB oracle expresses as
    ``regexp_split_to_array(lower(trim(text)), '\\s+')`` — keep the two
    in lockstep."""
    base = F.lower(col) if lowercase else col
    trimmed = F.btrim(base)
    return F.when(
        F.length(trimmed) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(trimmed, r"\s+"))


def word_ngrams(col: Column, n: int) -> Column:
    """Array of space-joined word ``n``-grams over whitespace tokens
    (empty when the document has fewer than ``n`` tokens). Pure
    ``transform``/``slice`` — stays in codegen, no Python in the scan."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    # The token array must reach the per-ngram lambda through a lambda
    # variable: a free column expression inside a lambda is inlined by
    # Catalyst and re-evaluated per element — full re-tokenization per
    # n-gram, O(len²) per document (see int8_quantize for the same fix).
    t = ws_tokens(col)
    return F.transform(
        F.array(F.struct(t.alias("t"))),
        lambda s: F.when(
            F.size(s["t"]) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(s["t"]) - n + 1),
                lambda i: F.array_join(F.slice(s["t"], i, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )[0]


def dup_ngram_fraction(col: Column, n: int = 2) -> Column:
    """Fraction of word ``n``-grams that are repeats of an earlier one
    (0.0 for documents shorter than ``n`` tokens) — the Gopher-style
    repetition signal: boilerplate and degenerate generations score
    high, natural prose scores near 0."""
    g = word_ngrams(col, n)
    return F.when(
        F.size(g) > 0,
        F.round(F.lit(1.0) - F.size(F.array_distinct(g)) / F.size(g), 6),
    ).otherwise(F.lit(0.0))


def repetition_signals(col: Column) -> Column:
    """Struct of within-document repetition ratios (duplicate word /
    bigram / trigram fractions) for quality filtering, computed in one
    projection."""
    return F.struct(
        dup_ngram_fraction(col, 1).alias("dup_word_frac"),
        dup_ngram_fraction(col, 2).alias("dup_bigram_frac"),
        dup_ngram_fraction(col, 3).alias("dup_trigram_frac"),
    )


def token_count(col: Column) -> Column:
    """Whitespace token count (0 for empty/blank text)."""
    trimmed = F.btrim(col)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def language_id(col: Column) -> Column:
    """Heuristic language tag: argmax of per-language stopword hit
    ratio; 'und' when nothing matches."""
    words = _words(col)
    n = F.greatest(F.size(words), F.lit(1))
    scored = F.array(
        *[
            F.struct(
                (F.size(F.array_intersect(words, F.array(*[F.lit(w) for w in sw]))) / n).alias("score"),
                F.lit(lang).alias("lang"),
            )
            for lang, sw in _LANG_STOPWORDS.items()
        ]
    )
    best = F.array_max(scored)
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def quality_score(col: Column) -> Column:
    """Composite 0-1 quality heuristic: length band, alpha ratio,
    terminal-punctuation presence, mean word length band. The exact
    recipe follows public heuristic-filter practice (length/punct/
    stopword-style signals); weights are uniform."""
    n_chars = F.length(col)
    words = _words(col)
    n_words = F.size(words)
    mean_word_len = F.when(n_words > 0, n_chars / n_words).otherwise(F.lit(0.0))
    alpha_ratio = F.when(
        n_chars > 0,
        F.length(F.regexp_replace(col, r"[^\p{L}]", "")) / n_chars,
    ).otherwise(F.lit(0.0))
    has_terminal = F.length(F.regexp_replace(col, r"[^.!?]", "")) > 0

    length_ok = (n_chars >= 100) & (n_chars <= 100_000)
    word_len_ok = (mean_word_len >= 3) & (mean_word_len <= 12)
    return (
        length_ok.cast("double")
        + word_len_ok.cast("double")
        + (alpha_ratio >= 0.6).cast("double")
        + has_terminal.cast("double")
    ) / 4.0


def doc_fingerprint(col: Column) -> Column:
    """Deterministic content fingerprint: md5 of whitespace-collapsed,
    lower-cased text. Two documents differing only in case/whitespace
    collide — that is the point (near-exact dedup key)."""
    normalized = F.btrim(F.regexp_replace(F.lower(col), r"\s+", " "))
    return F.md5(normalized)


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach all text-analysis columns in one projection (single scan)."""
    c = F.col(text_col)
    return (
        df.withColumn("n_tokens", token_count(c))
        .withColumn("lang_id", language_id(c))
        .withColumn("quality", quality_score(c))
        .withColumn("fingerprint", doc_fingerprint(c))
    )


# PII patterns chosen to mean the same thing under Java regex (Spark)
# and RE2 (DuckDB oracles): no backrefs, no lookaround.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "phone": (r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    "ip": (r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
}


def pii_scrub(col: Column, kinds: list[str] | None = None) -> Column:
    """Redact PII spans (emails, US-style phone numbers, IPv4
    addresses) with typed placeholders — pure ``regexp_replace``
    chain, full codegen, scan-speed over any corpus size. ``kinds``
    selects/orders the patterns (default: all, email first so its
    digit spans never half-match as phones)."""
    out = col
    for kind in kinds or list(PII_PATTERNS):
        pattern, token = PII_PATTERNS[kind]
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_counts(col: Column) -> Column:
    """Struct of per-category PII match counts, for corpus audits
    before/after scrubbing."""
    return F.struct(
        *[
            F.regexp_count(col, F.lit(pattern)).alias(kind)
            for kind, (pattern, _) in PII_PATTERNS.items()
        ]
    )


# BPE-style pre-tokenization pattern: letter runs, digit runs, and
# punctuation runs are separate tokens (the coarse split every BPE-family
# tokenizer applies before merges). Deliberately built from DISJOINT
# character classes only — no alternation-order or lookahead semantics —
# so Java regex (Spark) and RE2 (DuckDB oracles) agree exactly.
BPE_TOKEN_PATTERN = r"\p{L}+|\p{N}+|[^\p{L}\p{N}\s]+"


def bpe_token_count(col: Column) -> Column:
    """Token count under BPE-style pre-tokenization — the usual
    better-than-whitespace proxy for LLM token budgeting ('foo, bar!'
    is 4 tokens, not 2). Pure ``regexp_count``, full codegen."""
    return F.regexp_count(col, F.lit(BPE_TOKEN_PATTERN))


# Gopher document-quality rules (Rae et al. 2021, "Scaling Language
# Models: ... Gopher", table A1 — the filter set reproduced by Dolma /
# RedPajama / FineWeb pipelines). Required stop words per the paper:
_GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_signals(col: Column) -> Column:
    """Struct of the Gopher quality-rule signals for one document —
    pure Catalyst (codegen), no UDF. Fields:

    n_words, mean_word_len, symbol_word_ratio (# / ellipsis per word),
    bullet_line_frac, ellipsis_line_frac, alpha_word_frac,
    n_stop_words, and the composite boolean ``passes`` with the
    paper's thresholds (50 ≤ words ≤ 100k, 3 ≤ mean len ≤ 10,
    symbol ratio < .1, bullets < .9, ellipsis lines < .3,
    alpha words > .8, ≥ 2 distinct stop words)."""
    words = ws_tokens(col)
    n_words = F.greatest(F.size(words), F.lit(0))
    nw = F.greatest(n_words, F.lit(1)).cast("double")
    mean_len = F.aggregate(
        words, F.lit(0.0), lambda acc, w: acc + F.length(w)
    ) / nw
    n_symbols = (
        F.size(F.split(col, r"\.\.\.|…", -1))
        + F.size(F.split(col, r"#", -1))
        - F.lit(2)
    ).cast("double")
    lines = F.split(col, r"\n")
    n_lines = F.greatest(F.size(lines), F.lit(1)).cast("double")
    bullet_lines = F.size(
        F.filter(lines, lambda l: F.btrim(l).rlike(r"^([•‣▪\-\*])"))
    ).cast("double")
    ellipsis_lines = F.size(
        F.filter(lines, lambda l: F.btrim(l).rlike(r"(\.\.\.|…)$"))
    ).cast("double")
    alpha_words = F.size(
        F.filter(words, lambda w: w.rlike(r"[a-zA-Z]"))
    ).cast("double")
    stops = F.array(*[F.lit(s) for s in _GOPHER_STOPWORDS])
    n_stop = F.size(F.array_intersect(stops, words))
    sig = F.struct(
        n_words.cast("long").alias("n_words"),
        F.round(mean_len, 6).alias("mean_word_len"),
        F.round(n_symbols / nw, 6).alias("symbol_word_ratio"),
        F.round(bullet_lines / n_lines, 6).alias("bullet_line_frac"),
        F.round(ellipsis_lines / n_lines, 6).alias("ellipsis_line_frac"),
        F.round(alpha_words / nw, 6).alias("alpha_word_frac"),
        n_stop.cast("int").alias("n_stop_words"),
    )
    passes = (
        (n_words >= 50)
        & (n_words <= 100_000)
        & (mean_len >= 3)
        & (mean_len <= 10)
        & (n_symbols / nw < 0.1)
        & (bullet_lines / n_lines < 0.9)
        & (ellipsis_lines / n_lines < 0.3)
        & (alpha_words / nw > 0.8)
        & (n_stop >= 2)
    )
    return F.struct(sig.alias("signals"), passes.alias("passes"))


def gopher_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach ``gopher`` (signals struct) and ``gopher_passes`` columns
    — one projection, no shuffle; filter with
    ``df.where('gopher_passes')`` for the paper's cut."""
    g = gopher_quality_signals(F.col(text_col))
    return df.withColumn("gopher", g["signals"]).withColumn(
        "gopher_passes", g["passes"]
    )
