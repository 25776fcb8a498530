"""SQL front end: the delta-spark SQL statements a reference user runs
today, routed onto the native engine.

    from jodie_spark.sql import sql
    sql(spark, "DELETE FROM delta.`/data/events` WHERE day < '2024-01-01'")
    sql(spark, "MERGE INTO tgt t USING src s ON t.k = s.k "
               "WHEN MATCHED THEN UPDATE SET * "
               "WHEN NOT MATCHED THEN INSERT *")
    sql(spark, "OPTIMIZE tgt ZORDER BY (k)")
    sql(spark, "SELECT count(*) FROM tgt")           # Catalyst, fresh view

Table references are either a registered catalog name
(``jodie_spark.catalog``) or delta-spark's path form
``delta.`/abs/path```. SELECT/WITH statements pass through
``spark.sql`` after every registered view is refreshed to its current
snapshot, so queries always read the post-DML state. The DML dialect
is intentionally bounded — anything it can't parse raises with the
offending fragment rather than mis-executing.

Parsing is quote- and paren-aware (a ``WHERE`` inside a string literal
or subquery never splits a clause) but deliberately not a full SQL
grammar: expressions (conditions, assignments, values) are handed to
Spark's own parser via the DataFrame DML implementations.
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from jodie_spark.errors import JodieValidationError

_REF = r"(?:delta\.`(?P<path>[^`]+)`|(?P<name>[A-Za-z_][\w]*(?:\.[\w]+)*))"


def _skip_quoted(s: str, i: int) -> int:
    """``s[i]`` is an opening quote (', " or `); return the index just
    past its closing quote.  Handles Spark's default backslash escapes
    (``'O\\'Brien'``), SQL ''-doubling (``'O''Brien'``), and backtick
    doubling in identifiers.  Unterminated literals consume to EOS
    (callers raise a parse error on the leftover fragment)."""
    q = s[i]
    n = len(s)
    i += 1
    while i < n:
        c = s[i]
        if c == "\\" and q in "'\"" and i + 1 < n:
            i += 2  # backslash escape: skip escaped char
            continue
        if c == q:
            if i + 1 < n and s[i + 1] == q:
                i += 2  # doubled-quote escape
                continue
            return i + 1
        i += 1
    return n


def _is_kw_at(s: str, i: int, word: str) -> bool:
    wl = len(word)
    if s[i : i + wl].upper() != word.upper():
        return False
    before_ok = i == 0 or not (s[i - 1].isalnum() or s[i - 1] == "_")
    after = i + wl
    after_ok = after >= len(s) or not (s[after].isalnum() or s[after] == "_")
    return before_ok and after_ok


def _find_top_level(s: str, word: str, start: int = 0, skip_case: bool = False) -> int:
    """Index of the first occurrence of keyword ``word`` at paren depth
    0, outside quotes, or -1.  With ``skip_case`` a match inside a
    top-level ``CASE ... END`` block is ignored (so a CASE WHEN inside a
    MERGE action never splits the WHEN-clause chunking)."""
    depth = 0
    case_depth = 0
    i = start
    n = len(s)
    while i < n:
        c = s[i]
        if c in "'\"`":
            i = _skip_quoted(s, i)
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0:
            if skip_case and _is_kw_at(s, i, "CASE"):
                case_depth += 1
                i += 4
                continue
            if skip_case and case_depth > 0 and _is_kw_at(s, i, "END"):
                case_depth -= 1
                i += 3
                continue
            if case_depth == 0 and _is_kw_at(s, i, word):
                return i
        i += 1
    return -1


def _split_top_level(s: str, sep: str) -> list[str]:
    """Split on a single-char separator at depth 0, quote-aware (same
    escape rules as :func:`_find_top_level`)."""
    out, buf, depth, i, n = [], [], 0, 0, len(s)
    while i < n:
        c = s[i]
        if c in "'\"`":
            j = _skip_quoted(s, i)
            buf.append(s[i:j])
            i = j
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        if c == sep and depth == 0:
            out.append("".join(buf))
            buf = []
        else:
            buf.append(c)
        i += 1
    out.append("".join(buf))
    return [p.strip() for p in out if p.strip()]


def _parse_assignments(s: str) -> dict[str, str]:
    out: dict[str, str] = {}
    for part in _split_top_level(s, ","):
        m = re.match(r"^\s*([\w.`]+)\s*=\s*(.+)$", part, re.S)
        if not m:
            raise JodieValidationError(f"cannot parse SET assignment: {part!r}")
        out[m.group(1).strip("`")] = m.group(2).strip()
    return out


def _resolve(spark: SparkSession, m: re.Match):
    from jodie_spark.catalog import resolve_table_path
    from jodie_spark.tables.table import DeltaTable

    path = m.group("path")
    if path is None:
        path = resolve_table_path(m.group("name"))
    return DeltaTable.forPath(spark, path)


def _refresh_views(spark: SparkSession) -> None:
    from jodie_spark import catalog

    for name in list(catalog._REGISTRY):
        try:
            catalog.refresh_table(spark, name)
        except Exception:
            # stale registration (table dropped from disk): leave the
            # old view in place rather than failing unrelated statements
            pass


def sql(spark: SparkSession, statement: str) -> DataFrame | None:
    """Execute one statement. Returns a DataFrame for SELECT / WITH /
    DESCRIBE HISTORY / VACUUM DRY RUN; DML and utilities return None."""
    s = statement.strip().rstrip(";").strip()
    head = s.split(None, 1)[0].upper() if s else ""

    if head in ("SELECT", "WITH"):
        _refresh_views(spark)
        return spark.sql(_rewrite_time_travel(spark, s))

    if head == "DELETE":
        m = re.match(rf"(?is)^DELETE\s+FROM\s+{_REF}\s*(?:WHERE\s+(?P<cond>.+))?$", s)
        if not m:
            raise JodieValidationError(f"cannot parse DELETE statement: {s!r}")
        _resolve(spark, m).delete(m.group("cond"))
        return None

    if head == "UPDATE":
        m = re.match(rf"(?is)^UPDATE\s+{_REF}\s+SET\s+(?P<rest>.+)$", s)
        if not m:
            raise JodieValidationError(f"cannot parse UPDATE statement: {s!r}")
        rest = m.group("rest")
        wi = _find_top_level(rest, "WHERE")
        cond = rest[wi + 5 :].strip() if wi >= 0 else None
        sets = _parse_assignments(rest[:wi] if wi >= 0 else rest)
        _resolve(spark, m).update(cond, sets)
        return None

    if head == "MERGE":
        return _merge(spark, s)

    if head == "INSERT":
        m = re.match(
            rf"(?is)^INSERT\s+(?P<mode>INTO|OVERWRITE)\s+(?:TABLE\s+)?{_REF}\s+(?P<q>.+)$",
            s,
        )
        if not m:
            raise JodieValidationError(f"cannot parse INSERT statement: {s!r}")
        from jodie_spark.tables.table import write_delta

        t = _resolve(spark, m)
        _refresh_views(spark)
        q = m.group("q").strip()
        if q.upper().startswith("VALUES"):
            q = f"SELECT * FROM ({q}) "
        df = spark.sql(q)
        # positional semantics (SQL INSERT): align by the table's column order
        target_cols = [f.name for f in t.schema().fields]
        if len(df.columns) != len(target_cols):
            raise JodieValidationError(
                f"INSERT column count {len(df.columns)} does not match "
                f"table ({len(target_cols)})"
            )
        df = df.toDF(*target_cols)
        write_delta(
            df, t.path, mode="append" if m.group("mode").upper() == "INTO" else "overwrite"
        )
        return None

    if head == "ALTER":
        m = re.match(
            rf"(?is)^ALTER\s+TABLE\s+{_REF}\s+(?P<rest>.+)$", s
        )
        if not m:
            raise JodieValidationError(f"cannot parse ALTER statement: {s!r}")
        t = _resolve(spark, m)
        rest = m.group("rest").strip()
        mp = re.match(r"(?is)^SET\s+TBLPROPERTIES\s*\((?P<kv>.+)\)\s*$", rest)
        if mp:
            props: dict[str, str] = {}
            for part in _split_top_level(mp.group("kv"), ","):
                pm = re.match(r"""^\s*['"]?([^'"=\s]+)['"]?\s*=\s*['"]?([^'"]*)['"]?\s*$""", part)
                if not pm:
                    raise JodieValidationError(f"cannot parse property: {part!r}")
                props[pm.group(1)] = pm.group(2)
            t.set_properties(props)
            return None
        mc = re.match(
            r"(?is)^ADD\s+CONSTRAINT\s+(\w+)\s+CHECK\s*\((?P<e>.+)\)\s*$", rest
        )
        if mc:
            t.add_check_constraint(mc.group(1), mc.group("e").strip())
            return None
        md = re.match(r"(?is)^DROP\s+CONSTRAINT\s+(\w+)\s*$", rest)
        if md:
            t.drop_check_constraint(md.group(1))
            return None
        ma = re.match(r"(?is)^ADD\s+COLUMNS?\s*\(?(?P<defs>[^)]+?)\)?\s*$", rest)
        if ma:
            cols: dict[str, str] = {}
            for part in _split_top_level(ma.group("defs"), ","):
                dm2 = re.match(r"^\s*([\w`]+)\s+(.+)$", part)
                if not dm2:
                    raise JodieValidationError(f"cannot parse column def: {part!r}")
                cols[dm2.group(1).strip("`")] = dm2.group(2).strip()
            t.add_columns(cols)
            return None
        mr = re.match(r"(?is)^RENAME\s+COLUMN\s+([\w`]+)\s+TO\s+([\w`]+)\s*$", rest)
        if mr:
            t.rename_column(mr.group(1).strip("`"), mr.group(2).strip("`"))
            return None
        mdl = re.match(r"(?is)^DROP\s+COLUMN\s+([\w`]+)\s*$", rest)
        if mdl:
            t.drop_column(mdl.group(1).strip("`"))
            return None
        mk = re.match(r"(?is)^CLUSTER\s+BY\s*\((?P<cols>[^)]+)\)\s*$", rest)
        if mk:
            t.set_cluster_by([c.strip().strip("`") for c in mk.group("cols").split(",")])
            return None
        if re.match(r"(?is)^CLUSTER\s+BY\s+NONE\s*$", rest):
            t.set_cluster_by([])
            return None
        raise JodieValidationError(f"cannot parse ALTER action: {rest!r}")

    if head == "CREATE":
        # CREATE TABLE <target> SHALLOW CLONE <source> — zero-copy clone
        mc = re.match(
            r"(?is)^CREATE\s+TABLE\s+(?:delta\.`(?P<tpath>[^`]+)`|(?P<tname>[\w.]+)"
            r"(?:\s+LOCATION\s+'(?P<tloc>[^']+)')?)\s+SHALLOW\s+CLONE\s+"
            rf"{_REF}$",
            s,
        )
        if mc:
            from jodie_spark.catalog import register_delta_table
            from jodie_spark.operators.helpers import shallow_clone

            src_t = _resolve(spark, mc)
            dst = mc.group("tpath") or mc.group("tloc")
            if dst is None:
                raise JodieValidationError(
                    "SHALLOW CLONE needs a target location: CREATE TABLE "
                    "delta.`/path` SHALLOW CLONE src, or name LOCATION '/path'"
                )
            shallow_clone(src_t, dst)
            if mc.group("tname"):
                register_delta_table(spark, mc.group("tname"), dst)
            return None
        # CREATE TABLE <name> USING DELTA LOCATION '<path>'  (register)
        m = re.match(
            r"(?is)^CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(?P<tname>[\w.]+)\s+"
            r"USING\s+DELTA\s+LOCATION\s+'(?P<loc>[^']+)'$",
            s,
        )
        if m:
            from jodie_spark.catalog import register_delta_table

            register_delta_table(spark, m.group("tname"), m.group("loc"))
            return None
        # CTAS: CREATE TABLE <ref or name LOCATION 'p'> AS SELECT ...
        m = re.match(
            rf"(?is)^CREATE\s+TABLE\s+{_REF}"
            r"(?:\s+LOCATION\s+'(?P<loc>[^']+)')?\s+AS\s+(?P<q>.+)$",
            s,
        )
        if m:
            from jodie_spark.catalog import register_delta_table
            from jodie_spark.tables.table import write_delta

            _refresh_views(spark)
            df = spark.sql(m.group("q"))
            loc = m.group("path") or m.group("loc")
            if loc is None:
                raise JodieValidationError(
                    "CTAS needs a location: CREATE TABLE delta.`/path` AS "
                    "... or CREATE TABLE name LOCATION '/path' AS ..."
                )
            write_delta(df, loc)
            if m.group("name"):
                register_delta_table(spark, m.group("name"), loc)
            return None
        raise JodieValidationError(f"cannot parse CREATE statement: {s!r}")

    if head == "DROP":
        m = re.match(r"(?is)^DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?(?P<tname>[\w.]+)$", s)
        if not m:
            raise JodieValidationError(f"cannot parse DROP statement: {s!r}")
        from jodie_spark.catalog import unregister_table

        unregister_table(spark, m.group("tname"))  # catalog only; data stays
        return None

    if head == "CONVERT":
        m = re.match(
            r"(?is)^CONVERT\s+TO\s+DELTA\s+parquet\.`(?P<loc>[^`]+)`"
            r"(?:\s+PARTITIONED\s+BY\s*\((?P<cols>[^)]+)\))?$",
            s,
        )
        if not m:
            raise JodieValidationError(f"cannot parse CONVERT statement: {s!r}")
        from jodie_spark.sources.convert import convert_to_delta

        cols = (
            [c.strip().split()[0].strip("`") for c in m.group("cols").split(",")]
            if m.group("cols")
            else None
        )
        convert_to_delta(spark, m.group("loc"), partition_columns=cols)
        return None

    if head == "SHOW":
        m = re.match(rf"(?is)^SHOW\s+TBLPROPERTIES\s+{_REF}$", s)
        if not m:
            raise JodieValidationError(f"cannot parse SHOW statement: {s!r}")
        t = _resolve(spark, m)
        cfg = t.snapshot().configuration
        return spark.createDataFrame(
            sorted(cfg.items()), "key string, value string"
        )

    if head == "OPTIMIZE":
        m = re.match(
            rf"(?is)^OPTIMIZE\s+{_REF}\s*(?:WHERE\s+(?P<cond>.+?))?"
            r"(?:\s*ZORDER\s+BY\s*\((?P<cols>[^)]+)\))?$",
            s,
        )
        if not m:
            raise JodieValidationError(f"cannot parse OPTIMIZE statement: {s!r}")
        t = _resolve(spark, m)
        b = t.optimize()
        if m.group("cond"):
            b = b.where(m.group("cond").strip())
        if m.group("cols"):
            cols = [c.strip().strip("`") for c in m.group("cols").split(",")]
            b.executeZOrderBy(*cols)
        else:
            b.executeCompaction()
        return None

    if head == "VACUUM":
        m = re.match(
            rf"(?is)^VACUUM\s+{_REF}\s*(?:RETAIN\s+(?P<hours>[\d.]+)\s+HOURS?)?"
            r"\s*(?P<dry>DRY\s+RUN)?$",
            s,
        )
        if not m:
            raise JodieValidationError(f"cannot parse VACUUM statement: {s!r}")
        t = _resolve(spark, m)
        hours = float(m.group("hours")) if m.group("hours") else 168.0
        result = t.vacuum(retention_hours=hours, dry_run=bool(m.group("dry")))
        if m.group("dry"):
            return spark.createDataFrame([(p,) for p in result or []], "path string")
        return None

    if head == "RESTORE":
        m = re.match(
            rf"(?is)^RESTORE\s+(?:TABLE\s+)?{_REF}\s+TO\s+VERSION\s+AS\s+OF\s+(?P<v>\d+)$",
            s,
        )
        if not m:
            raise JodieValidationError(f"cannot parse RESTORE statement: {s!r}")
        _resolve(spark, m).restore(int(m.group("v")))
        return None

    if head == "DESCRIBE":
        m = re.match(rf"(?is)^DESCRIBE\s+(?P<what>HISTORY|DETAIL)\s+{_REF}$", s)
        if not m:
            raise JodieValidationError(f"cannot parse DESCRIBE statement: {s!r}")
        t = _resolve(spark, m)
        return t.history() if m.group("what").upper() == "HISTORY" else t.detail()

    raise JodieValidationError(
        f"unsupported SQL statement (supported: SELECT/WITH, DELETE, UPDATE, "
        f"MERGE, INSERT, ALTER TABLE, SHOW TBLPROPERTIES, OPTIMIZE, VACUUM, "
        f"RESTORE, DESCRIBE HISTORY): {s[:80]!r}"
    )


_TT_RE = re.compile(
    r"(?is)(?:delta\.`(?P<path>[^`]+)`|(?P<name>[A-Za-z_]\w*))\s+"
    r"(?:VERSION\s+AS\s+OF\s+(?P<v>\d+)|TIMESTAMP\s+AS\s+OF\s+'(?P<ts>[^']+)')"
)


def _rewrite_time_travel(spark: SparkSession, s: str) -> str:
    """delta-spark's ``t VERSION AS OF n`` / ``TIMESTAMP AS OF 'ts'``
    inside SELECTs: each occurrence becomes a temp view over the
    historical snapshot, substituted into the statement.

    View names are deterministic per (path, pin) — repeated time-travel
    queries reuse (re-create) the same view instead of leaking a fresh
    ``__tt_*`` view per query, and the substitution runs only over
    top-level unquoted segments so a ``VERSION AS OF`` inside a string
    literal is never rewritten."""
    import hashlib as _hashlib

    from jodie_spark.catalog import _REGISTRY
    from jodie_spark.tables.table import DeltaTable

    def sub(m: re.Match) -> str:
        path = m.group("path")
        if path is None:
            path = _REGISTRY.get(m.group("name"))
            if path is None:
                return m.group(0)  # not one of ours — leave for Catalyst
        t = DeltaTable.forPath(spark, path)
        if m.group("v") is not None:
            pin = f"v{int(m.group('v'))}"
            df = t.toDF(version=int(m.group("v")))
        else:
            pin = f"ts{m.group('ts')}"
            df = t.toDF(timestamp=m.group("ts"))
        view = "__tt_" + _hashlib.md5(f"{path}\x00{pin}".encode()).hexdigest()[:12]
        df.createOrReplaceTempView(view)
        return view

    # substitute only outside string literals (backticks stay in the
    # searchable text — the delta.`/path` ref form itself uses them)
    out: list[str] = []
    i, n = 0, len(s)
    seg_start = 0
    while i < n:
        if s[i] in "'\"":
            out.append(_TT_RE.sub(sub, s[seg_start:i]))
            j = _skip_quoted(s, i)
            out.append(s[i:j])
            i = j
            seg_start = i
        else:
            i += 1
    out.append(_TT_RE.sub(sub, s[seg_start:]))
    return "".join(out)


def _merge(spark: SparkSession, s: str) -> None:
    m = re.match(
        rf"(?is)^MERGE\s+INTO\s+{_REF}\s*(?:AS\s+)?(?P<talias>[A-Za-z_]\w*)?\s+USING\s+",
        s,
    )
    if not m:
        raise JodieValidationError(f"cannot parse MERGE statement: {s!r}")
    t = _resolve(spark, m)
    talias = m.group("talias") or "t"
    rest = s[m.end() :]

    # source: (subquery) or a view/registered name
    if rest.lstrip().startswith("("):
        rest = rest.lstrip()
        depth, i = 0, 0
        for i, c in enumerate(rest):
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    break
        _refresh_views(spark)
        src_df = spark.sql(rest[1:i])
        rest = rest[i + 1 :]
    else:
        m2 = re.match(r"(?s)^\s*([\w.`]+)", rest)
        if not m2:
            raise JodieValidationError("cannot parse MERGE source")
        src_name = m2.group(1).strip("`")
        _refresh_views(spark)
        src_df = spark.table(src_name)
        rest = rest[m2.end() :]
    m3 = re.match(r"(?is)^\s*(?:AS\s+)?([A-Za-z_]\w*)?\s*ON\s+", rest)
    if not m3:
        raise JodieValidationError("cannot parse MERGE ON clause")
    salias = m3.group(1) or "s"
    rest = rest[m3.end() :]

    wi = _find_top_level(rest, "WHEN", skip_case=True)
    if wi < 0:
        raise JodieValidationError("MERGE requires at least one WHEN clause")
    cond = rest[:wi].strip()
    clauses_text = rest[wi:]

    builder = t.alias(talias).merge(src_df.alias(salias), cond)
    # split into WHEN ... chunks at top level (skip_case: a CASE WHEN
    # inside an action expression must not start a new clause)
    chunks = []
    pos = 0
    while True:
        nxt = _find_top_level(clauses_text, "WHEN", pos + 1, skip_case=True)
        if nxt < 0:
            chunks.append(clauses_text[pos:])
            break
        chunks.append(clauses_text[pos:nxt])
        pos = nxt
    for chunk in chunks:
        c = re.match(
            r"(?is)^WHEN\s+(?P<not>NOT\s+)?MATCHED\s*(?:AND\s+(?P<cond>.+?))?\s*THEN\s+(?P<act>.+)$",
            chunk.strip(),
        )
        if not c:
            raise JodieValidationError(f"cannot parse MERGE clause: {chunk!r}")
        ccond = c.group("cond").strip() if c.group("cond") else None
        act = c.group("act").strip()
        if c.group("not"):
            ia = re.match(r"(?is)^INSERT\s*\*\s*$", act)
            if ia:
                builder = builder.whenNotMatchedInsertAll(ccond)
                continue
            iv = re.match(
                r"(?is)^INSERT\s*\((?P<cols>[^)]+)\)\s*VALUES\s*\((?P<vals>.+)\)\s*$",
                act,
            )
            if not iv:
                raise JodieValidationError(f"cannot parse INSERT action: {act!r}")
            cols = [x.strip().strip("`") for x in iv.group("cols").split(",")]
            vals = _split_top_level(iv.group("vals"), ",")
            if len(cols) != len(vals):
                raise JodieValidationError("INSERT column/value count mismatch")
            builder = builder.whenNotMatchedInsert(
                condition=ccond, values=dict(zip(cols, vals))
            )
        elif re.match(r"(?is)^DELETE\s*$", act):
            builder = builder.whenMatchedDelete(ccond)
        else:
            ua = re.match(r"(?is)^UPDATE\s+SET\s+(?P<sets>.+)$", act)
            if not ua:
                raise JodieValidationError(f"cannot parse MATCHED action: {act!r}")
            if ua.group("sets").strip() == "*":
                builder = builder.whenMatchedUpdateAll(ccond)
            else:
                builder = builder.whenMatchedUpdate(
                    condition=ccond, set=_parse_assignments(ua.group("sets"))
                )
    builder.execute()
    return None
