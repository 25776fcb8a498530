"""robots.txt (RFC 9309, the Robots Exclusion Protocol) compliance
filtering — the crawl-side legal/etiquette gate a responsible corpus
pipeline applies before keeping a page.

``parse_robots_rules`` turns a (host, robots_txt) table into per-host
rule rows for ONE user agent: the RFC's group-selection logic (the
most specific matching ``User-agent`` group wins; ``*`` is the
fallback; groups for other agents are ignored) runs in an
Arrow-batched kernel, leaving (host, allow, pattern, specificity)
rows. ``filter_by_robots`` then joins documents to rules BY HOST and
applies the RFC match semantics per URL: longest-match wins,
``Allow`` beats ``Disallow`` on ties, no matching rule (or no
robots.txt for the host) means allowed. ``*`` and ``$`` wildcards are
supported by compiling each rule to a SQL ``LIKE`` pattern — so the
match itself is a pure Catalyst expression and the whole decision is
value-checkable by a SQL oracle.

Scale shape: rules tables are small next to a corpus (one row per
rule, even a million hosts × 20 rules is ~GBs) — the join broadcasts
when it fits and otherwise shuffles (host, path) pairs only; the
winner election is one map-side-combined ``min_by`` aggregation,
never a window over the corpus.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_RULES_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("allow", T.BooleanType()),
        T.StructField("like_pattern", T.StringType()),
        T.StructField("specificity", T.IntegerType()),
    ]
)


def _to_like(rule_path: str) -> str:
    """REP path rule → SQL LIKE pattern: '*' → '%', a trailing '$'
    anchors (otherwise the rule is a prefix → trailing '%'); LIKE
    metacharacters in the rule are escaped with backslash."""
    anchored = rule_path.endswith("$")
    if anchored:
        rule_path = rule_path[:-1]
    out = []
    for ch in rule_path:
        if ch == "*":
            out.append("%")
        elif ch in ("%", "_", "\\"):
            out.append("\\" + ch)
        else:
            out.append(ch)
    pat = "".join(out)
    return pat if anchored else pat + "%"


def _parse_one(txt: str, user_agent: str) -> list[tuple[bool, str, int]]:
    """RFC 9309 group selection + rule extraction for one agent:
    returns (allow, like_pattern, specificity) rows. Specificity is
    the rule-path length sans wildcards (the RFC's longest-match
    measure)."""
    ua = user_agent.lower()
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    agents: list[str] = []
    rules: list[tuple[bool, str]] = []
    in_group_body = False
    for raw in (txt or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if in_group_body:
                groups.append((agents, rules))
                agents, rules = [], []
                in_group_body = False
            agents.append(val.lower())
        elif key in ("allow", "disallow"):
            in_group_body = True
            if val:  # an empty Disallow means "allow all" — no rule
                rules.append((key == "allow", val))
        # other keys (crawl-delay, sitemap, ...) end nothing per RFC
    if agents or rules:
        groups.append((agents, rules))
    # most specific matching agent TOKEN wins; '*' is the fallback —
    # then, per RFC 9309 §2.2.1, rules from ALL groups naming that
    # winning token are MERGED into one effective group (a robots.txt
    # with two 'User-agent: *' groups contributes both rule sets, not
    # just whichever parsed first)
    best_tok: str | None = None
    best_len = -1
    for ags, _rls in groups:
        for a in ags:
            if a != "*" and a in ua and len(a) > best_len:
                best_tok, best_len = a, len(a)
    merged: list[tuple[bool, str]] = []
    for ags, rls in groups:
        if (best_tok in ags) if best_tok is not None else ("*" in ags):
            merged.extend(rls)
    out = []
    for allow, path in merged:
        spec = len(path.replace("*", "").replace("$", ""))
        out.append((allow, _to_like(path), spec))
    return out


def parse_robots_rules(
    robots_df: DataFrame,
    host_col: str = "host",
    txt_col: str = "robots_txt",
    user_agent: str = "*",
) -> DataFrame:
    """(host, robots_txt) → (host, allow, like_pattern, specificity)
    rule rows for ``user_agent``."""
    import pandas as pd

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for host, txt in zip(pdf[host_col], pdf[txt_col]):
                for allow, pat, spec in _parse_one(str(txt or ""), user_agent):
                    rows.append(
                        {
                            "host": host,
                            "allow": allow,
                            "like_pattern": pat,
                            "specificity": spec,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in _RULES_SCHEMA.fields]
            )

    return robots_df.mapInPandas(batches, _RULES_SCHEMA)


def filter_by_robots(
    df: DataFrame,
    robots_df: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    txt_col: str = "robots_txt",
    user_agent: str = "*",
    broadcast_rules: bool = True,
) -> DataFrame:
    """Keep only rows whose URL the host's robots.txt allows for
    ``user_agent``. RFC 9309 decision per URL: among rules whose
    pattern matches the path, the longest (most specific) wins;
    Allow beats Disallow at equal length; no match → allowed; hosts
    without robots.txt → allowed; un-parseable URLs → kept."""
    from jodie_spark.functions.urls import url_host, url_path

    rules = parse_robots_rules(robots_df, host_col, txt_col, user_agent)
    if broadcast_rules:
        rules = F.broadcast(rules)
    key = (
        df.select(
            F.col(url_col).alias("__u__"),
            url_host(F.col(url_col)).alias("__h__"),
            F.coalesce(url_path(F.col(url_col)), F.lit("/")).alias("__p__"),
        )
        .filter(F.col("__u__").isNotNull())
        .distinct()
    )
    matched = key.join(
        rules,
        (key["__h__"] == rules["host"])
        & F.like(key["__p__"], rules["like_pattern"], F.lit("\\")),
        "left",
    )
    # winner per URL: min over (-specificity, NOT allow) — longest rule
    # first, allow beats disallow on ties; NULL rule rows (no robots /
    # no matching rule) decide "allowed"
    verdict = matched.groupBy("__u__").agg(
        F.coalesce(
            F.min_by(
                F.col("allow"),
                F.struct(
                    (-F.col("specificity")).alias("__s__"),
                    (~F.col("allow")).cast("int").alias("__a__"),
                ),
            ),
            F.lit(True),
        ).alias("__ok__")
    )
    allowed = verdict.filter(F.col("__ok__")).select(
        F.col("__u__").alias(url_col)
    )
    # NULL-host URLs got verdict=allowed via the left join; only rows
    # whose url_col itself is NULL need the explicit carry-through
    # (a semi join on NULL never matches)
    return df.join(allowed, url_col, "left_semi").unionByName(
        df.filter(F.col(url_col).isNull())
    )
