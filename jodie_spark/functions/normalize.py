"""Text normalization for training-data pipelines: Unicode NFC/NFKC,
control-character stripping, and whitespace canonicalization.

Everything except the Unicode normal-form step is a pure
``regexp_replace`` chain (full whole-stage codegen, scan speed at any
corpus size). Unicode normalization itself has no Catalyst expression
in Spark 4.x, so ``unicode_normalize`` is the one Arrow-batched pandas
UDF in this module — ``unicodedata.normalize`` over a pandas Series,
~10⁶ short strings/s per core, and it composes with the codegen steps
in a single projection (one scan, no extra shuffle).

DuckDB-oracle parity: ``nfc_normalize`` on the DuckDB side agrees with
Python's ``unicodedata.normalize("NFC", ...)``; the regex steps use
only explicit ASCII character classes (``[\\x00-\\x08...]``) that Java
regex (Spark) and RE2 (DuckDB) interpret identically — no ``\\s``,
whose ASCII range differs between the engines (Java includes U+000B,
RE2 does not).
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# C0 controls except \t \n \r \f, plus DEL. \f is stripped too (it is
# collapsed as whitespace below, but stripping it here keeps the
# whitespace class minimal and engine-portable).
CONTROL_CHAR_PATTERN = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"

# Explicit ASCII whitespace class — identical semantics in Java regex
# and RE2 (never use \s across the two engines; see module docstring).
WS_RUN_PATTERN = r"[ \t\n\r]+"

_NORMAL_FORMS = ("NFC", "NFKC", "NFD", "NFKD")


def unicode_normalize(col: Column, form: str = "NFC") -> Column:
    """Unicode normal form of ``col`` (default NFC: canonical
    composition — 'e' + COMBINING ACUTE becomes the single é code
    point). Arrow-batched pandas UDF; the only non-codegen step in
    this module."""
    if form not in _NORMAL_FORMS:
        raise ValueError(f"form must be one of {_NORMAL_FORMS}, got {form!r}")

    @pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        return s.map(lambda v: unicodedata.normalize(form, v) if v is not None else None)

    return _norm(col)


def strip_control_chars(col: Column) -> Column:
    """Remove C0 control characters (except tab/newline/CR) and DEL —
    the bytes that break downstream tokenizers and JSON encoders.
    Pure ``regexp_replace``, full codegen."""
    return F.regexp_replace(col, CONTROL_CHAR_PATTERN, "")


def clean_whitespace(col: Column) -> Column:
    """Collapse runs of ASCII whitespace to a single space and trim.
    Pure codegen."""
    return F.btrim(F.regexp_replace(col, WS_RUN_PATTERN, " "))


def normalize_text(col: Column, form: str | None = "NFC") -> Column:
    """The standard corpus-normalization chain: Unicode normal form →
    strip control chars → collapse/trim whitespace. Pass
    ``form=None`` to skip the Unicode step and stay 100% codegen
    (right call for known-ASCII corpora).

    Equivalent DuckDB oracle:
    ``trim(regexp_replace(regexp_replace(nfc_normalize(text),
    '[\\x00-...]', '', 'g'), '[ \\t\\n\\r]+', ' ', 'g'))``.
    """
    out = col if form is None else unicode_normalize(col, form)
    return clean_whitespace(strip_control_chars(out))
