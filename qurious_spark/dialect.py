"""SQL dialect shim.

The reference accepts a PostgreSQL-ish dialect with a few constructs vanilla
Spark SQL lacks (SURVEY.md §7.1):

- table functions in FROM: ``read_csv('p', delimiter=>'|')``, ``read_json``,
  ``read_parquet`` (reference: qurious/src/planner/sql.rs:751-774,
  session.rs:169-192) — rewritten here to registered temp views;
- ``COPY <table> FROM '<file>' (FORMAT CSV, DELIMITER '|', HEADER)``
  (reference: qurious/src/planner/sql.rs:324-375);
- DDL/DML against managed in-memory tables (CREATE/DROP/INSERT/DELETE/UPDATE,
  reference: session.rs:128-151, 217-246) — parsed here, executed by
  ``Session``;
- trailing commas in CREATE TABLE column lists
  (reference fixture: tests/tpch/create_tables.slt:10 ends ``s_rev VARCHAR,)``).

Spark 4 natively supports ``expr::TYPE`` casts, typed literals
(``DATE '1998-09-02'``), INTERVAL arithmetic, EXTRACT, and Kleene AND/OR, so
none of those need rewriting.

This is a deliberately small regex-based pre-parser, not a SQL parser: every
statement it does not recognize is passed through to Spark SQL untouched.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass
class DdlDmlStatement:
    kind: str  # create_table | drop_table | insert | delete | update | copy_from | merge
    table: str = ""
    if_exists: bool = False
    if_not_exists: bool = False
    columns: list[tuple[str, str, object]] | None = None  # (name, spark_type, default)
    columns_list: list[str] | None = None  # INSERT (col, ...) subset
    query: str = ""
    predicate: str | None = None
    assignments: dict[str, str] = field(default_factory=dict)
    path: str = ""
    options: dict[str, object] = field(default_factory=dict)
    # MERGE-only fields
    alias: str | None = None
    source: str = ""  # table name or subquery text
    source_is_query: bool = False
    source_alias: str | None = None
    on_cond: str = ""
    clauses: list["MergeClause"] = field(default_factory=list)


@dataclass
class MergeClause:
    """One WHEN [NOT] MATCHED [AND cond] THEN <action> arm, in statement
    order (first matching arm wins, per the SQL standard)."""

    matched: bool
    cond: str | None  # the AND refinement, if any
    action: str  # update | delete | insert
    assignments: dict[str, str] = field(default_factory=dict)  # update
    insert_columns: list[str] | None = None  # insert; None = INSERT *
    insert_values: list[str] | None = None  # insert; None = INSERT *


# SQL type -> Spark type, per the reference mapping
# (qurious/src/planner/sql.rs:1439-1477 sql_to_arrow_data_type; SURVEY.md §1.2).
_TYPE_MAP = {
    "BOOLEAN": "boolean",
    "BOOL": "boolean",
    "SMALLINT": "smallint",
    "INT": "bigint",  # reference maps INT/INTEGER to Int64 (sql.rs:1441)
    "INTEGER": "bigint",
    "BIGINT": "bigint",
    "FLOAT": "double",  # reference maps FLOAT to Float64 (sql.rs:1443)
    "DOUBLE": "double",
    "VARCHAR": "string",
    "TEXT": "string",
    "STRING": "string",
    "DATE": "date",
    "TIMESTAMP": "timestamp",
}


def map_sql_type(sql_type: str) -> str:
    t = sql_type.strip().upper()
    m = re.match(r"DECIMAL\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)", t)
    if m:
        p, s = int(m.group(1)), int(m.group(2))
        # Reference maps p>38 to Arrow Decimal256 (sql.rs:1451-1475). Spark
        # has no 256-bit decimal (DecimalType caps at 38), so rather than
        # silently downcasting — which would corrupt values the reference
        # stores exactly — we reject with an explicit, tested error.
        if p > 38:
            raise ValueError(
                f"DECIMAL({p},{s}): precision above 38 is not supported "
                "(Spark DecimalType caps at 38; the reference engine would "
                "use a 256-bit decimal here)"
            )
        if s > p:
            raise ValueError(f"DECIMAL({p},{s}): scale exceeds precision")
        return f"decimal({p},{s})"
    if t == "DECIMAL":
        return "decimal(38,10)"  # reference default (sql.rs:1451-1475)
    if t in _TYPE_MAP:
        return _TYPE_MAP[t]
    return sql_type.lower()


_CREATE_RE = re.compile(
    r"^\s*CREATE\s+TABLE\s+(?:(IF\s+NOT\s+EXISTS)\s+)?([\w.]+)\s*(.*)$",
    re.IGNORECASE | re.DOTALL,
)
_DROP_RE = re.compile(
    r"^\s*DROP\s+TABLE\s+(?:(IF\s+EXISTS)\s+)?([\w.]+)\s*;?\s*$", re.IGNORECASE
)
_INSERT_RE = re.compile(
    r"^\s*INSERT\s+INTO\s+([\w.]+)\s*(\([^)]*\))?\s*(VALUES\s*.*|SELECT\s+.*)$",
    re.IGNORECASE | re.DOTALL,
)
_DELETE_RE = re.compile(
    r"^\s*DELETE\s+FROM\s+([\w.]+)(?:\s+WHERE\s+(.*?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_TRUNCATE_RE = re.compile(r"^\s*TRUNCATE\s+(?:TABLE\s+)?([\w.]+)\s*;?\s*$", re.IGNORECASE)
# Only the UPDATE..SET prefix is regex-matched; the SET/WHERE split is done
# by a paren/quote-aware scan (_find_top_level_keyword) so subqueries and
# string literals containing " WHERE " don't truncate the assignment list.
_UPDATE_PREFIX_RE = re.compile(
    r"^\s*UPDATE\s+([\w.]+)\s+SET\s+(.*?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_COPY_RE = re.compile(
    r"^\s*COPY\s+([\w.]+)\s+FROM\s+'([^']+)'\s*(?:\(([^)]*)\))?\s*;?\s*$",
    re.IGNORECASE,
)
# COPY ... TO — unimplemented todo!() in the reference (sql.rs:315-322);
# implemented here via df.write (SURVEY.md §7.4.6).
_COPY_TO_RE = re.compile(
    r"^\s*COPY\s+([\w.]+)\s+TO\s+'([^']+)'\s*(?:\(([^)]*)\))?\s*;?\s*$",
    re.IGNORECASE,
)


def parse_ddl_dml(text: str) -> DdlDmlStatement | None:
    """Recognize DDL/DML statements the Session executes itself; return None
    for plain queries (handed to Spark SQL)."""
    stmt = _parse_merge(text)
    if stmt is not None:
        return stmt

    m = _COPY_RE.match(text)
    if m:
        opts: dict[str, object] = {}
        for part in _split_top_level_commas(m.group(3) or ""):
            part = part.strip()
            if not part:
                continue
            kv = re.match(r"(\w+)\s*(?:\s+'?([^']*)'?)?$", part)
            if kv:
                key = kv.group(1).lower()
                val = kv.group(2)
                if key == "delimiter":
                    opts["delimiter"] = val
                elif key == "header":
                    opts["header"] = val is None or val.lower() in ("true", "on")
                elif key == "format":
                    opts["format"] = (val or "csv").lower()
                elif key == "multiline":
                    opts["multiline"] = val is None or val.lower() in ("true", "on")
        return DdlDmlStatement(kind="copy_from", table=m.group(1), path=m.group(2), options=opts)

    m = _COPY_TO_RE.match(text)
    if m:
        opts: dict[str, object] = {}
        for part in _split_top_level_commas(m.group(3) or ""):
            part = part.strip()
            if not part:
                continue
            kv = re.match(r"(\w+)\s*(?:\s+'?([^']*)'?)?$", part)
            if kv:
                key = kv.group(1).lower()
                val = kv.group(2)
                if key == "format":
                    opts["format"] = (val or "parquet").lower()
                elif key == "delimiter":
                    opts["delimiter"] = val
                elif key == "header":
                    opts["header"] = val is None or val.lower() in ("true", "on")
        return DdlDmlStatement(kind="copy_to", table=m.group(1), path=m.group(2), options=opts)

    m = _DROP_RE.match(text)
    if m:
        return DdlDmlStatement(kind="drop_table", table=m.group(2), if_exists=bool(m.group(1)))

    m = _CREATE_RE.match(text)
    if m:
        rest = m.group(3).strip().rstrip(";").strip()
        stmt = DdlDmlStatement(
            kind="create_table", table=m.group(2), if_not_exists=bool(m.group(1))
        )
        as_match = re.match(r"^(?:\((.*)\)\s*)?AS\s+(SELECT.*|VALUES.*)$", rest, re.IGNORECASE | re.DOTALL)
        if as_match:
            stmt.query = as_match.group(2)
            return stmt
        if rest.startswith("("):
            body = rest[1:]
            depth = 1
            end = len(body)
            for i, ch in enumerate(body):
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                    if depth == 0:
                        end = i
                        break
            stmt.columns = _parse_column_defs(body[:end])
            return stmt
        if not rest:
            stmt.columns = []
            return stmt
        return stmt

    m = _INSERT_RE.match(text)
    if m:
        cols = None
        if m.group(2):
            cols = [c.strip() for c in m.group(2).strip("() \t\n").split(",") if c.strip()]
        return DdlDmlStatement(
            kind="insert",
            table=m.group(1),
            columns_list=cols,
            query=m.group(3).rstrip().rstrip(";"),
        )

    m = _DELETE_RE.match(text)
    if m:
        return DdlDmlStatement(kind="delete", table=m.group(1), predicate=m.group(2))

    m = _TRUNCATE_RE.match(text)
    if m:
        # TRUNCATE = unconditional delete (keeps schema + defaults)
        return DdlDmlStatement(kind="delete", table=m.group(1), predicate=None)

    m = _UPDATE_PREFIX_RE.match(text)
    if m:
        body = m.group(2)
        # UPDATE t SET ... FROM src WHERE join_cond  (Postgres/DuckDB form):
        # desugar to MERGE with a single WHEN MATCHED UPDATE arm — identical
        # semantics including the error on a target row matching multiple
        # source rows (DuckDB raises there too; Postgres picks arbitrarily,
        # which a deterministic engine must not).
        from_i = _find_top_level_keyword(body, "FROM")
        if from_i >= 0:
            set_part = body[:from_i].rstrip()
            after = body[from_i + len("FROM") :]
            wsplit = _find_top_level_keyword(after, "WHERE")
            source_part, on_cond = (
                (after[:wsplit].strip(), after[wsplit + len("WHERE") :].strip().rstrip(";"))
                if wsplit >= 0
                else (after.strip().rstrip(";"), "TRUE")
            )
            assignments = {}
            for part in _split_top_level_commas(set_part):
                k, _, v = part.partition("=")
                assignments[k.strip()] = v.strip()
            src_is_query = source_part.startswith("(")
            if src_is_query:
                close = source_part.rfind(")")
                src_text = source_part[1:close]
                # the UPDATE regex is case-insensitive, so the optional AS
                # keyword must be stripped case-insensitively too
                tail = source_part[close + 1 :].strip()
                if tail[:3].upper() == "AS " or tail[:3].upper() == "AS\t":
                    tail = tail[3:].strip()
                src_alias = tail or None
            else:
                toks = source_part.split()
                src_text = toks[0]
                rest = [t for t in toks[1:] if t.upper() != "AS"]
                src_alias = rest[0] if rest else None
            return DdlDmlStatement(
                kind="merge",
                table=m.group(1),
                alias=m.group(1),  # target referenced by its own name
                source=src_text,
                source_is_query=src_is_query,
                source_alias=src_alias or src_text,
                on_cond=on_cond,
                clauses=[
                    MergeClause(
                        matched=True, cond=None, action="update", assignments=assignments
                    )
                ],
            )
        split = _find_top_level_keyword(body, "WHERE")
        set_part, predicate = (
            (body[:split].rstrip(), body[split + len("WHERE") :].strip())
            if split >= 0
            else (body, None)
        )
        assignments: dict[str, str] = {}
        for part in _split_top_level_commas(set_part):
            k, _, v = part.partition("=")
            assignments[k.strip()] = v.strip()
        return DdlDmlStatement(
            kind="update", table=m.group(1), assignments=assignments, predicate=predicate
        )

    return None


_MERGE_HEAD_RE = re.compile(
    r"^\s*MERGE\s+INTO\s+([\w.]+)(?:\s+(?:AS\s+)?(?!USING\b)(\w+))?\s+USING\s+",
    re.IGNORECASE,
)
_MERGE_WHEN_RE = re.compile(r"\bWHEN\s+(NOT\s+)?MATCHED\b", re.IGNORECASE)


def _parse_merge(text: str) -> DdlDmlStatement | None:
    """MERGE INTO t [alias] USING (src|query) [alias] ON cond WHEN ... —
    upsert DML absent from the reference (its DML stops at INSERT/DELETE,
    qurious/src/execution/session.rs:128-151); standard SQL:2003 semantics."""
    m = _MERGE_HEAD_RE.match(text)
    if not m:
        return None
    stmt = DdlDmlStatement(kind="merge", table=m.group(1), alias=m.group(2))
    rest = text[m.end() :]
    if rest.lstrip().startswith("("):
        rest = rest.lstrip()
        depth = 0
        end = -1
        for i, ch in enumerate(rest):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    end = i
                    break
        if end < 0:
            raise ValueError("MERGE: unbalanced parens in USING source")
        stmt.source = rest[1:end].strip()
        stmt.source_is_query = True
        rest = rest[end + 1 :]
    else:
        m2 = re.match(r"\s*([\w.]+)", rest)
        if not m2:
            raise ValueError("MERGE: missing USING source")
        stmt.source = m2.group(1)
        rest = rest[m2.end() :]
    m3 = re.match(
        r"\s*(?:(?:AS\s+)?(?!ON\b)(\w+)\s+)?ON\s+(.*)$", rest, re.IGNORECASE | re.DOTALL
    )
    if not m3:
        raise ValueError("MERGE: missing ON condition")
    stmt.source_alias = m3.group(1)
    tail = m3.group(2)
    whens = list(_MERGE_WHEN_RE.finditer(tail))
    if not whens:
        raise ValueError("MERGE: at least one WHEN clause required")
    stmt.on_cond = tail[: whens[0].start()].strip()
    for i, w in enumerate(whens):
        seg_end = whens[i + 1].start() if i + 1 < len(whens) else len(tail)
        seg = tail[w.end() : seg_end].strip().rstrip(";").strip()
        stmt.clauses.append(_parse_merge_clause(matched=not w.group(1), seg=seg))
    return stmt


def _parse_merge_clause(matched: bool, seg: str) -> MergeClause:
    m = re.match(r"(?:AND\s+(.*?)\s+)?THEN\s+(.*)$", seg, re.IGNORECASE | re.DOTALL)
    if not m:
        raise ValueError(f"MERGE: cannot parse WHEN clause: {seg!r}")
    cond, action_text = m.group(1), m.group(2).strip()
    up = action_text.upper()
    if up.startswith("DELETE"):
        if not matched:
            raise ValueError("MERGE: WHEN NOT MATCHED cannot DELETE")
        return MergeClause(matched=matched, cond=cond, action="delete")
    if up.startswith("UPDATE"):
        if not matched:
            raise ValueError("MERGE: WHEN NOT MATCHED cannot UPDATE")
        mu = re.match(r"UPDATE\s+SET\s+(.*)$", action_text, re.IGNORECASE | re.DOTALL)
        if not mu:
            raise ValueError(f"MERGE: cannot parse UPDATE action: {action_text!r}")
        assignments: dict[str, str] = {}
        for part in _split_top_level_commas(mu.group(1)):
            k, _, v = part.partition("=")
            # allow `t.col = expr`; the target column is the bare name
            assignments[k.strip().split(".")[-1]] = v.strip()
        return MergeClause(matched=matched, cond=cond, action="update", assignments=assignments)
    if up.startswith("INSERT"):
        if matched:
            raise ValueError("MERGE: WHEN MATCHED cannot INSERT")
        body = action_text[len("INSERT") :].strip()
        if body == "*" or body == "":
            return MergeClause(matched=matched, cond=cond, action="insert")
        mi = re.match(r"(\(([^)]*)\)\s*)?VALUES\s*\((.*)\)\s*$", body, re.IGNORECASE | re.DOTALL)
        if not mi:
            raise ValueError(f"MERGE: cannot parse INSERT action: {action_text!r}")
        cols = None
        if mi.group(2):
            cols = [c.strip().split(".")[-1] for c in mi.group(2).split(",") if c.strip()]
        vals = [v.strip() for v in _split_top_level_commas(mi.group(3))]
        if cols is not None and len(cols) != len(vals):
            raise ValueError("MERGE: INSERT column/value count mismatch")
        return MergeClause(
            matched=matched, cond=cond, action="insert", insert_columns=cols, insert_values=vals
        )
    raise ValueError(f"MERGE: unknown action: {action_text!r}")


def _parse_column_defs(body: str) -> list[tuple[str, str, object]]:
    """Parse ``name TYPE [NOT NULL] [DEFAULT v]`` lists; tolerates the
    reference's trailing comma (tests/tpch/create_tables.slt:10).

    Returns (name, spark_type, default) triples; a NOT NULL constraint is
    signaled by wrapping the default in ``NotNull`` (enforced on INSERT /
    MERGE-insert by the Session — the reference parses but never enforces
    it; we do, per SURVEY §7.4.6's implement-correctly rule)."""
    cols: list[tuple[str, str, object]] = []
    for part in _split_top_level_commas(body):
        part = part.strip()
        if not part:
            continue  # trailing comma tolerance
        m = re.match(
            r"(\w+)\s+(\w+(?:\s*\(\s*\d+\s*,\s*\d+\s*\))?)"
            r"(\s+NOT\s+NULL)?(?:\s+NULL)?(?:\s+DEFAULT\s+(.+))?$",
            part,
            re.IGNORECASE,
        )
        if not m:
            raise ValueError(f"cannot parse column definition: {part!r}")
        default = None
        if m.group(4) is not None:
            raw = m.group(4).strip()
            default = _parse_literal(raw)
        if m.group(3):
            default = NotNull(default)
        cols.append((m.group(1), map_sql_type(m.group(2)), default))
    return cols


class NotNull:
    """Marker wrapping a column default: the column carries NOT NULL."""

    def __init__(self, default: object = None):
        self.default = default


def _parse_literal(raw: str) -> object:
    if raw.startswith("'") and raw.endswith("'"):
        return raw[1:-1]
    low = raw.lower()
    if low == "null":
        return None
    if low in ("true", "false"):
        return low == "true"
    try:
        return int(raw)
    except ValueError:
        pass
    try:
        return float(raw)
    except ValueError:
        pass
    return raw


def _find_top_level_keyword(s: str, keyword: str) -> int:
    """Index of the first whole-word ``keyword`` outside parens, string
    literals, and quoted identifiers ("..." / `...`); -1 if absent. Same
    depth/quote rules as _split_top_level_commas — an alias like
    ``SELECT a AS "order by"`` must not register as a keyword hit."""
    kw = keyword.upper()
    depth, quote = 0, None
    i, n = 0, len(s)
    while i < n:
        ch = s[i]
        if quote is not None:
            if ch == quote:
                quote = None
        elif ch in ("'", '"', "`"):
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and s[i : i + len(kw)].upper() == kw:
            before_ok = i == 0 or not (s[i - 1].isalnum() or s[i - 1] == "_")
            after = i + len(kw)
            after_ok = after >= n or not (s[after].isalnum() or s[after] == "_")
            if before_ok and after_ok:
                return i
        i += 1
    return -1


def _split_top_level_commas(s: str) -> list[str]:
    parts, depth, quote, cur = [], 0, None, []
    for ch in s:
        if quote is not None:
            if ch == quote:
                quote = None
        elif ch in ("'", '"', "`"):
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
            continue
        cur.append(ch)
    parts.append("".join(cur))
    return parts


_INTERVAL_SUM_RE = re.compile(
    r"\binterval\s+('\d+'(?:\s*\+\s*'\d+')+)\s+(year|month|day|hour|minute|second)s?\b",
    re.IGNORECASE,
)


def fold_interval_quantity(text: str) -> str:
    """``interval '1' + '2' day`` → ``INTERVAL '3' DAY``.

    The reference constant-folds the quantity expression of an interval
    literal at plan time (qurious/src/planner/sql.rs:1146-1229, fixture
    tests/sql/type.slt IntervalBinaryExpr); Spark's parser only accepts a
    single quantity literal, so we fold it here."""

    def repl(m: re.Match) -> str:
        total = sum(int(q) for q in re.findall(r"'(\d+)'", m.group(1)))
        return f"INTERVAL '{total}' {m.group(2).upper()}"

    return _INTERVAL_SUM_RE.sub(repl, text)


def _select_output_idents(select_list: str) -> dict[str, set[str | None]]:
    """Lower-cased output column names a ``SELECT <list>`` exposes, mapped
    to the source identifiers that expose them. Exposure rules: the AS
    alias, a bare or qualified identifier's trailing name, or — for ANY
    other item — the trailing bare identifier if one exists. The last rule
    is a deliberate over-approximation (``a + b`` "exposes" b): a false
    positive merely skips the ORDER BY carry, restoring pre-carry behavior,
    while a miss used to inject a bogus bare column into the inner select
    (round-6 advisor finding: no-AS expression aliases like
    ``count(*) cnt`` followed by ``ORDER BY cnt``).

    The value set records, per exposed name, the lower-cased (possibly
    qualified) identifier the exposing item selects when that item IS a
    plain identifier (``t.x``, ``x``, ``t.x AS x``); any other item shape
    contributes ``None``. A qualified ORDER BY reference is only rewritten
    to the bare output name when its own identifier (or its bare trailing
    form) appears here — rewriting on name alone silently bound
    ``ORDER BY t.x`` to an exposed ``s.x`` from a different source
    (round-7 advisor finding)."""
    body = re.sub(r"^\s*SELECT\s+(DISTINCT\s+)?", "", select_list, flags=re.IGNORECASE)
    names: dict[str, set[str | None]] = {}
    for item in _split_top_level_commas(body):
        item = item.strip()
        m = re.search(r"^(.*?)\s+AS\s+([A-Za-z_]\w*)\s*$", item, re.IGNORECASE | re.DOTALL)
        if m:
            expr = m.group(1).strip()
            src = (
                expr.lower()
                if re.fullmatch(r"[A-Za-z_]\w*(\.[A-Za-z_]\w*)?", expr)
                else None
            )
            names.setdefault(m.group(2).lower(), set()).add(src)
        elif re.fullmatch(r"[A-Za-z_]\w*(\.[A-Za-z_]\w*)?", item):
            names.setdefault(item.split(".")[-1].lower(), set()).add(item.lower())
        else:
            m2 = re.search(r"([A-Za-z_]\w*)\s*$", item)
            if m2:
                names.setdefault(m2.group(1).lower(), set()).add(None)
    return names


def rewrite_qualify(text: str, wrap: bool = False) -> str:
    """DuckDB/Snowflake-style ``QUALIFY <window-pred>`` desugar.

    Default (inline) form — ``SELECT <list> FROM ... [WHERE/GROUP BY/
    HAVING] QUALIFY p [ORDER BY/LIMIT tail]`` becomes::

        SELECT * EXCEPT (__qual)
        FROM (SELECT <list>, (p) AS __qual FROM ...) __qualified
        WHERE __qual [tail]

    — the predicate joins the inner select list, so it may window over ANY
    in-scope column (selected or not), like DuckDB. Spark refuses lateral
    alias references inside window expressions
    (UNSUPPORTED_FEATURE.LATERAL_COLUMN_ALIAS_IN_WINDOW), so a predicate
    windowing over a SELECT ALIAS needs ``wrap=True``::

        SELECT * EXCEPT (__qual)
        FROM (SELECT *, (p) AS __qual FROM (<query>) __qualify_base) q
        WHERE __qual [tail]

    where aliases are materialized columns (but unselected base columns go
    out of scope). Session.sql tries inline first and retries wrapped on
    that specific analysis error, covering both DuckDB-parity cases.
    Top-level only; SELECT DISTINCT + QUALIFY is rejected rather than
    silently reordered.
    """
    i = _find_top_level_keyword(text, "QUALIFY")
    if i < 0:
        return text
    head, rest = text[:i], text[i + len("QUALIFY") :]
    if re.match(r"^\s*SELECT\s+DISTINCT\b", head, re.IGNORECASE):
        raise ValueError(
            "QUALIFY with SELECT DISTINCT is not supported — filter in a "
            "subquery instead (DISTINCT-then-QUALIFY ordering is ambiguous)"
        )
    cuts = [
        k
        for k in (_find_top_level_keyword(rest, w) for w in ("ORDER", "LIMIT", "OFFSET"))
        if k >= 0
    ]
    j = min(cuts) if cuts else -1
    pred, tail = (rest[:j], rest[j:]) if j >= 0 else (rest, "")
    pred = pred.strip().rstrip(";")
    f = _find_top_level_keyword(head, "FROM")
    if f < 0:
        return text  # SELECT without FROM: nothing to qualify over
    # The ORDER BY tail lands OUTSIDE the generated subquery (it must sort
    # the filtered rows), so a bare base column that the select list doesn't
    # expose would fall out of scope — legal in DuckDB and in plain Spark.
    # Inline form: carry such columns through the inner select and EXCEPT
    # them away in the outer projection (round-5 advisor finding; the
    # "appears anywhere in the select text" shortcut was itself caught by
    # the QUALIFY fuzzer — a column referenced inside a window expression is
    # NOT exposed — so exposure is decided on the parsed OUTPUT names).
    # Only simple (possibly qualified) identifiers are carried; ORDER BY
    # over an unselected *expression* still needs selecting it (documented
    # limitation), as does the wrap form, whose inner
    # ``SELECT * FROM (<query>)`` has no base columns left to carry.
    # Qualified ``t.col`` items are carried through the inner select and
    # the tail reference is rewritten to the bare trailing name — the outer
    # query only sees ``__qualified``'s output columns, so the qualified
    # form can never resolve there (round-6 advisor finding: previously
    # neither carried nor rejected).
    extra: list[str] = []  # expressions appended to the inner select list
    extra_names: list[str] = []  # their exposed trailing names, for EXCEPT
    select_list = head[: f]
    if not wrap and tail:
        om = re.match(
            r"^(\s*ORDER\s+BY\s+)(.*?)(\bLIMIT\b.*|\bOFFSET\b.*|$)",
            tail,
            re.IGNORECASE | re.DOTALL,
        )
        # a top-level wildcard item (* / t.*) already exposes every base
        # column — test the split items, not the raw text, which would trip
        # on COUNT(*) (found by the QUALIFY fuzzer)
        has_wildcard = any(
            it.strip() == "*" or it.strip().endswith(".*")
            for it in _split_top_level_commas(
                re.sub(r"^\s*SELECT\s+(DISTINCT\s+)?", "", select_list, flags=re.IGNORECASE)
            )
        )
        if om and not has_wildcard:
            exposed = _select_output_idents(select_list)
            # Under JOIN .. USING / NATURAL JOIN, a bare exposed ``x`` is the
            # COALESCED join column, which t.x/s.x do not equal on non-inner
            # joins — so a qualified ORDER BY item may only be rewritten to
            # the bare name when the select item is that same qualified
            # identifier; bare exposure is not proof of source (round-8
            # advisor finding). Elsewhere a bare ``SELECT x`` that analyzed
            # is unambiguous (two sources with x would be an analysis
            # error), so t.x == exposed x and bare exposure suffices.
            # Deliberately OVER-conservative: this scans all of head[f:],
            # so a USING(...)/NATURAL JOIN inside a derived-table subquery
            # (or even a string literal) also suppresses the rewrite. The
            # failure direction is safe — the qualified ORDER BY then fails
            # analysis LOUDLY instead of ever sorting by the wrong (
            # non-coalesced) column; no registry or slt query hits the
            # false-positive case (round-9 advisor note).
            coalescing_join = bool(
                re.search(
                    r"\bUSING\s*\(|\bNATURAL\s+(?:\w+\s+)*JOIN\b",
                    head[f:],
                    re.IGNORECASE,
                )
            )
            carried_from: dict[str, str] = {}  # trailing name -> source ident
            new_items: list[str] = []
            tail_changed = False
            for item in _split_top_level_commas(om.group(2)):
                mm = re.match(
                    r"^(\s*)([A-Za-z_]\w*(?:\.[A-Za-z_]\w*)?)"
                    r"((?:\s+(?:ASC|DESC|NULLS\s+(?:FIRST|LAST)))*\s*;?\s*)$",
                    item,
                    re.IGNORECASE,
                )
                if not mm:
                    new_items.append(item)
                    continue
                ident = mm.group(2)
                trailing = ident.split(".")[-1]
                key = trailing.lower()
                if key in exposed:
                    # already an output column; a qualified ref is rewritten
                    # to the bare output name ONLY when the exposing select
                    # item is that same identifier (qualified or bare) —
                    # otherwise ``ORDER BY t.x`` over an exposed ``s.x``
                    # would silently sort by the wrong source, so the item
                    # is left as-is and fails analysis loudly instead
                    # (round-7 advisor finding); under a coalescing join the
                    # bare name isn't proof of source (round-8, above)
                    accept = (
                        {ident.lower()} if coalescing_join else {ident.lower(), key}
                    )
                    if "." in ident and exposed[key] & accept:
                        new_items.append(mm.group(1) + trailing + mm.group(3))
                        tail_changed = True
                    else:
                        new_items.append(item)
                    continue
                if key in carried_from:
                    if carried_from[key] != ident:
                        # two distinct sources would collide on one exposed
                        # name — leave the item alone (analysis error beats
                        # a silently wrong sort key)
                        new_items.append(item)
                        continue
                else:
                    carried_from[key] = ident
                    extra.append(ident)
                    extra_names.append(trailing)
                if "." in ident:
                    new_items.append(mm.group(1) + trailing + mm.group(3))
                    tail_changed = True
                else:
                    new_items.append(item)
            if tail_changed:
                tail = om.group(1) + ",".join(new_items) + om.group(3)
    carried = "".join(f", {c}" for c in extra)
    except_list = ", ".join(["__qual", *extra_names])
    if wrap:
        inner = (
            f"SELECT *, ({pred}) AS __qual FROM ({head.rstrip()}) __qualify_base"
        )
    else:
        inner = f"{head[:f].rstrip()}{carried}, ({pred}) AS __qual {head[f:]}".rstrip()
    return (
        f"SELECT * EXCEPT ({except_list}) FROM ({inner}) __qualified "
        f"WHERE __qual {tail}"
    )


_READ_FN_RE = re.compile(
    r"\b(read_csv|read_json|read_parquet|read_orc)\s*\(\s*'([^']+)'\s*((?:,[^)]*)?)\)",
    re.IGNORECASE,
)


def rewrite_table_functions(session, text: str) -> str:
    """Rewrite ``FROM read_csv('p', opts)`` to a registered temp view name.

    The reference resolves these at parse/registration time
    (session.rs:169-192); we do the same: eagerly register a (lazy) reader
    DataFrame as a temp view named after a hash of the path (the reference
    derives table identity from a path hash too, table_relation.rs:41-45).
    """
    from qurious_spark.sources.readers import read_csv_like

    def repl(m: re.Match) -> str:
        fn = m.group(1).lower()
        path = m.group(2)
        opt_str = m.group(3) or ""
        options = _parse_read_options(opt_str)
        view = "file_" + re.sub(r"\W", "_", path).strip("_")
        if fn == "read_csv":
            df = read_csv_like(
                session.spark,
                path,
                delimiter=options.get("delimiter", ","),
                header=options.get("has_header", options.get("header", True)),
            )
        elif fn == "read_json":
            df = session.spark.read.json(path)
        elif fn == "read_orc":
            df = session.spark.read.orc(path)
        else:
            df = session.spark.read.parquet(path)
        df.createOrReplaceTempView(view)
        return view

    return _READ_FN_RE.sub(repl, text)


def _parse_read_options(opt_str: str) -> dict[str, object]:
    options: dict[str, object] = {}
    # quote-aware: delimiter=>',' must not split on its own comma
    for part in _split_top_level_commas(opt_str):
        part = part.strip()
        if not part:
            continue
        m = re.match(r"(\w+)\s*(?:=>|=)\s*(.+)$", part)
        if m:
            options[m.group(1).lower()] = _parse_literal(m.group(2).strip())
    return options
