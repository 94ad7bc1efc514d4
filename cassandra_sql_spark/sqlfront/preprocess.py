"""PostgreSQL-isms -> Spark SQL preprocessing.

The design principle (SURVEY §7.1): no hand-written SQL parser or
interpreter — Catalyst is the parser/analyzer/optimizer. This module only
rewrites the handful of surface-level PostgreSQL constructs Spark SQL does
not accept, with targeted regexes over a literal-masked text:

- ``expr::type`` casts           -> CAST(expr AS type)  (+ pg type names)
- ``j ->> 'k'`` / ``j -> 'k'``   -> get_json_object(j, '$.k')
  (reference kv/JsonHelper.java:67-134)
- ``j #>> '{a,b}'`` / ``#>``     -> get_json_object(j, '$.a.b')
- ``j -> 0``                     -> get_json_object(j, '$[0]')
- ``x ~ 'pat'`` / ``!~``         -> RLIKE / NOT RLIKE
- type-name spellings (TEXT, BYTEA, INT4/8, SERIAL...) inside CAST
- ``BETWEEN SYMMETRIC`` -> least/greatest; ``FETCH FIRST``/``OFFSET n
  ROWS`` -> LIMIT/OFFSET; ``TABLESAMPLE BERNOULLI|SYSTEM(p)`` -> Spark
  TABLESAMPLE; ``DISTINCT ON`` -> ROW_NUMBER peel
- ``QUALIFY pred`` (any nesting depth, incl. CTE bodies) -> projected
  predicate + outer filter peeled with ``* EXCEPT``
- ``agg(x) FILTER (WHERE p) OVER`` -> ``agg(CASE WHEN p THEN x END)
  OVER`` (Spark rejects window-aggregate filters)

String literals (including doubled-quote escapes) are masked to opaque
placeholders before any rewrite and restored afterwards, so ``::``, ``->``
or ``~`` INSIDE a literal can never be rewritten. Cast operands are found
with a balanced-paren scanner, so arbitrarily nested ``(...)::type``
works. Everything else passes through verbatim to spark.sql().
"""

from __future__ import annotations

import re

# pg type name -> Spark DDL type (SURVEY §1.2 table; deliberately maps
# NUMERIC/DECIMAL to real DecimalType — better than the reference's
# int-or-double storage, kv/ValueEncoder.java:176-191).
PG_TYPE_MAP = {
    "TEXT": "STRING",
    "VARCHAR": "STRING",
    "CHAR": "STRING",
    "BPCHAR": "STRING",
    "CHARACTER VARYING": "STRING",
    "INT2": "SMALLINT",
    "INT4": "INT",
    "INT8": "BIGINT",
    "INTEGER": "INT",
    "SERIAL": "INT",
    "SMALLSERIAL": "SMALLINT",
    "BIGSERIAL": "BIGINT",
    "DOUBLE PRECISION": "DOUBLE",
    "REAL": "FLOAT",
    "BYTEA": "BINARY",
    "BLOB": "BINARY",
    "BOOL": "BOOLEAN",
    "JSON": "STRING",
    "JSONB": "STRING",
    "UUID": "STRING",
    "TIMESTAMPTZ": "TIMESTAMP",
    "TIMESTAMP WITH TIME ZONE": "TIMESTAMP",
    "TIMESTAMP WITHOUT TIME ZONE": "TIMESTAMP",
    # Typed day-time interval (upgrade over the reference, which stores
    # intervals as ISO STRINGS and cannot compute with them,
    # kv/TableMetadata.java:348-349): Spark's DayTimeIntervalType
    # round-trips through parquet and supports timestamp arithmetic
    # natively. String inserts coerce via CAST ('d hh:mm:ss[.f]' form).
    "INTERVAL": "INTERVAL DAY TO SECOND",
}

# a masked string literal placeholder (see _mask_literals)
_PH = r"\x00L\d+\x00"
# an operand for the json/regex operators: qualified identifier, function
# call (no space before the paren — else `SELECT (expr)` would match),
# parenthesized expression (one level), or masked literal
_OPERAND = rf"(\([^()]*\)|[A-Za-z_][\w.]*\([^()]*\)|[A-Za-z_][\w.]*|{_PH})"

_LITERAL = re.compile(r"'(?:[^']|'')*'")
_PH_RE = re.compile(r"\x00L(\d+)\x00")


def _mask_literals(sql: str) -> tuple[str, list]:
    lits: list = []

    def sub(m):
        lits.append(m.group(0))
        return f"\x00L{len(lits) - 1}\x00"

    return _LITERAL.sub(sub, sql), lits


def _new_lit(lits: list, text: str) -> str:
    """Mask a literal EMITTED by a rewrite (e.g. a json path) so later
    passes can't rewrite inside it either."""
    lits.append(text)
    return f"\x00L{len(lits) - 1}\x00"


def _unmask(sql: str, lits: list) -> str:
    # placeholders never nest inside lits entries, one pass suffices
    return _PH_RE.sub(lambda m: lits[int(m.group(1))], sql)


def map_pg_type(t: str) -> str:
    """Map a pg type name (possibly with (p[,s]) suffix) to Spark DDL."""
    t = t.strip()
    m = re.match(
        r"([A-Za-z_][A-Za-z0-9_ ]*?)\s*(\(\s*\d+\s*(?:,\s*\d+\s*)?\))?\s*$",
        t,
    )
    if not m:
        return t
    base, args = m.group(1).strip().upper(), m.group(2)
    base = re.sub(r"\s+", " ", base)
    if base in ("NUMERIC", "DECIMAL"):
        return f"DECIMAL{args or '(38,18)'}"
    if base in ("VARCHAR", "CHAR", "BPCHAR", "CHARACTER VARYING"):
        return "STRING"
    mapped = PG_TYPE_MAP.get(base, base)
    if args and mapped not in ("STRING",):
        return f"{mapped}{args}"
    return mapped


_TYPE_RE = re.compile(
    r"\s*([A-Za-z_]\w*(?:\s+(?:PRECISION|VARYING|ZONE))?"
    r"(?:\s*\(\s*\d+\s*(?:,\s*\d+\s*)?\))?)",
    re.IGNORECASE,
)
_IDENT_TAIL = re.compile(r"[A-Za-z_][\w.]*\Z")
_NUM_TAIL = re.compile(r"\d+(?:\.\d+)?\Z")
_CASE_END = re.compile(r"\b(CASE|END)\b", re.IGNORECASE)
_PH_TAIL = re.compile(r"\x00L\d+\x00\Z")


def _rewrite_casts(sql: str) -> str:
    """``operand::type`` -> CAST(operand AS type) with a balanced-paren
    backward scan for the operand — handles arbitrary nesting, function
    calls, identifiers, and masked literals. Unrewritable ``::`` (e.g.
    slice syntax the engine never sees) is left untouched."""
    pos = 0
    while True:
        i = sql.find("::", pos)
        if i == -1:
            return sql
        j = i - 1
        while j >= 0 and sql[j].isspace():
            j -= 1
        start = -1
        if j >= 0 and sql[j] == ")":
            depth, k = 0, j
            while k >= 0:
                if sql[k] == ")":
                    depth += 1
                elif sql[k] == "(":
                    depth -= 1
                    if depth == 0:
                        break
                k -= 1
            if depth == 0:
                start = k
                # attached function name: f(...)::type casts the call
                m = _IDENT_TAIL.search(sql, 0, k)
                if m and m.end() == k:
                    start = m.start()
        elif j >= 0 and sql[j] == "\x00":
            m = _PH_TAIL.search(sql, 0, j + 1)
            if m:
                start = m.start()
        elif j >= 0 and (sql[j].isalnum() or sql[j] in "_."):
            m = _IDENT_TAIL.search(sql, 0, j + 1) or _NUM_TAIL.search(
                sql, 0, j + 1
            )
            if m:
                start = m.start()
                if sql[start:j + 1].upper() == "END":
                    # CASE ... END::type — extend back to the matching
                    # CASE (CASE/END nest)
                    depth, k = 1, start
                    for km in reversed(
                        list(_CASE_END.finditer(sql, 0, start))
                    ):
                        depth += 1 if km.group(0).upper() == "END" else -1
                        if depth == 0:
                            k = km.start()
                            break
                    start = k if depth == 0 else -1
        tm = _TYPE_RE.match(sql, i + 2) if start >= 0 else None
        if not tm:
            pos = i + 2
            continue
        cast = f"CAST({sql[start:j + 1]} AS {map_pg_type(tm.group(1))})"
        sql = sql[:start] + cast + sql[tm.end():]
        # rescan from inside the new CAST: a nested operand may itself
        # contain ``::`` (each rewrite consumes one, so this terminates)
        pos = start + 5


def _json_path_from_literal(lit: str, nested: bool = False) -> str:
    inner = lit.strip()[1:-1]  # strip quotes
    if nested:  # '{a,b,c}' path
        parts = [p.strip() for p in inner.strip("{}").split(",") if p.strip()]
        return "$." + ".".join(parts)
    return f"$.{inner}"


def _rewrite_json_ops(sql: str, lits: list) -> str:
    # #>> and #> (nested path) first, then ->> / -> (single key or index)
    def nested(m):
        lit = lits[int(m.group(2))]
        if not re.match(r"'\{[^']*\}'$", lit):
            return m.group(0)
        path = _new_lit(lits, f"'{_json_path_from_literal(lit, True)}'")
        return f"get_json_object({m.group(1)}, {path})"

    sql = re.sub(_OPERAND + r"\s*#>{1,2}\s*\x00L(\d+)\x00", nested, sql)

    def scalar(m):
        lit = lits[int(m.group(2))]
        path = _new_lit(lits, f"'{_json_path_from_literal(lit)}'")
        return f"get_json_object({m.group(1)}, {path})"

    prev = None
    while prev != sql:
        prev = sql
        sql = re.sub(_OPERAND + r"\s*->>?\s*\x00L(\d+)\x00", scalar, sql)
        # array index: j -> 0
        sql = re.sub(
            _OPERAND + r"\s*->>?\s*(\d+)",
            lambda m: f"get_json_object({m.group(1)}, "
                      f"{_new_lit(lits, chr(39) + '$[' + m.group(2) + ']' + chr(39))})",
            sql,
        )
    return sql


def _rewrite_regex_match(sql: str) -> str:
    sql = re.sub(
        _OPERAND + rf"\s*!~\s*({_PH})",
        lambda m: f"{m.group(1)} NOT RLIKE {m.group(2)}",
        sql,
    )
    # `~` only when followed by a string literal (avoids bitwise-not clash)
    sql = re.sub(
        _OPERAND + rf"\s*~\s*({_PH})",
        lambda m: f"{m.group(1)} RLIKE {m.group(2)}",
        sql,
    )
    return sql


_FUNC_ALIASES = {
    # pg name -> spark equivalent (same arity)
    r"\bjsonb_array_length\s*\(": "json_array_length(",
    r"\bjson_array_length\s*\(": "json_array_length(",
    r"\bstrpos\s*\(": "instr(",
    r"\bceiling\s*\(": "ceil(",
    r"\bpow\s*\(": "power(",
    r"\blength\s*\(": "length(",
    r"\bnow\s*\(\s*\)": "current_timestamp()",
    # pg to_char format tokens differ from Spark's builtin to_char;
    # pg_to_char (functions/pg.py) translates them
    r"\bto_char\s*\(": "pg_to_char(",
    # psql handshake staples: Spark's built-ins of the same name answer
    # with Spark strings, so route to the pg_-prefixed SQL functions
    r"\bversion\s*\(\s*\)": "pg_version()",
    r"\bcurrent_database\s*\(\s*\)": "pg_current_database()",
}


# BETWEEN SYMMETRIC operand: _OPERAND plus numeric literals (masking only
# covers strings)
_BT_OPERAND = rf"(?:-?\d+(?:\.\d+)?|{_OPERAND.strip('()')})"
_BETWEEN_SYM = re.compile(
    rf"\bBETWEEN\s+SYMMETRIC\s+({_BT_OPERAND})\s+AND\s+({_BT_OPERAND})",
    re.IGNORECASE,
)


def _rewrite_tablesample(sql: str) -> str:
    """pg ``TABLESAMPLE BERNOULLI(p) | SYSTEM(p)`` -> Spark's
    ``TABLESAMPLE (p PERCENT)``. Bernoulli row sampling maps exactly;
    SYSTEM (page sampling) has no Spark analog, so it degrades to row
    sampling — a superset of pg's guarantees (pg SYSTEM is allowed to be
    block-coarse; row sampling is strictly finer)."""
    return re.sub(
        r"\bTABLESAMPLE\s+(?:BERNOULLI|SYSTEM)\s*\(\s*([0-9.]+)\s*\)",
        lambda m: f"TABLESAMPLE ({m.group(1)} PERCENT)",
        sql,
        flags=re.IGNORECASE,
    )


def _rewrite_distinct_on(sql: str) -> str:
    """pg ``SELECT DISTINCT ON (keys) list FROM ... [ORDER BY ord]`` ->
    first-row-per-key via ROW_NUMBER, peeled with Spark's ``* EXCEPT``.

    pg semantics: the first row of each key group in ORDER BY order wins
    (pg requires ORDER BY to lead with the DISTINCT ON keys). Without an
    ORDER BY the surviving row is unspecified in pg; here the keys
    themselves order the window, making it deterministic. Supported form:
    one top-level SELECT whose ORDER BY (if any) references columns
    visible in the select list — the overwhelmingly common spelling."""
    # split off a trailing LIMIT/OFFSET/FETCH first — the lazy ORDER BY
    # capture would otherwise absorb it into the window's ORDER BY
    # ("ORDER BY k, c LIMIT 10" -> invalid window order "c LIMIT 10")
    tail = ""
    tm = re.search(
        r"(?is)\s+(LIMIT\s+\d+(?:\s+OFFSET\s+\d+)?|OFFSET\s+\d+"
        r"(?:\s+ROWS?)?(?:\s+FETCH\s+.*)?|FETCH\s+.*?)\s*;?\s*$",
        sql,
    )
    if tm and re.match(r"(?is)^\s*SELECT\s+DISTINCT\s+ON\b", sql):
        tail = " " + re.sub(r";\s*$", "", tm.group(1).strip())
        sql = sql[: tm.start()]
    m = re.match(
        r"(?is)^\s*SELECT\s+DISTINCT\s+ON\s*\(([^)]*)\)\s*(.*?)"
        r"\s+FROM\s+(.*?)(?:\s+ORDER\s+BY\s+(.*?))?\s*;?\s*$",
        sql,
    )
    if not m:
        return sql + tail
    keys, select_list, from_part, order = (
        m.group(1).strip(),
        m.group(2).strip(),
        m.group(3).strip(),
        (m.group(4) or "").strip(),
    )
    win_order = order if order else keys
    # inner SELECT * keeps every base column visible, so the outer ORDER
    # BY may reference columns NOT in the select list (pg sorts before
    # projecting; Spark's ResolveMissingReferences does the same here)
    outer = (
        "* EXCEPT (__rn)" if select_list.strip() == "*" else select_list
    )
    out = (
        f"SELECT {outer} FROM (SELECT *, "
        f"ROW_NUMBER() OVER (PARTITION BY {keys} ORDER BY {win_order}) "
        f"AS __rn FROM {from_part}) WHERE __rn = 1"
    )
    if order:
        out += f" ORDER BY {order}"
    return out + tail


def _paren_depth(sql: str) -> list:
    """depth[i] = paren nesting depth BEFORE character i (masked SQL, so
    parens inside string literals are already gone)."""
    depth = [0] * (len(sql) + 1)
    d = 0
    for i, ch in enumerate(sql):
        depth[i] = d
        if ch == "(":
            d += 1
        elif ch == ")":
            d = max(0, d - 1)
    depth[len(sql)] = d
    return depth


def _rewrite_qualify(sql: str) -> str:
    """``QUALIFY <pred>`` (DuckDB/Snowflake/BigQuery; filters on window
    functions without a subquery) -> the subquery Spark needs.

    ``SELECT list FROM ... QUALIFY pred [ORDER BY/LIMIT tail]`` becomes
    ``SELECT * EXCEPT (__qualify) FROM (SELECT list, (pred) AS __qualify
    FROM ...) WHERE __qualify tail``. The predicate is injected into the
    SAME select list, so it sees base columns not in the projection,
    named WINDOW clauses, and aggregates under GROUP BY; references to
    select-list aliases (``QUALIFY rn <= 3``) resolve via Spark's lateral
    column aliases. QUALIFY evaluates BEFORE ``DISTINCT`` (DuckDB order),
    so DISTINCT moves to the outer select. Top-level set operations are
    left untouched (apply QUALIFY inside the arm instead)."""
    if not re.search(r"(?i)\bQUALIFY\b", sql):
        return sql
    body = re.sub(r";\s*$", "", sql)
    depth = _paren_depth(body)
    qm = next(
        (
            m
            for m in re.finditer(r"(?i)\bQUALIFY\b", body)
            if depth[m.start()] == 0
        ),
        None,
    )
    if qm is None:
        return sql
    if any(
        depth[m.start()] == 0
        for m in re.finditer(
            r"(?i)\b(UNION|INTERSECT|EXCEPT)\b", body[: qm.start()]
        )
    ):
        return sql
    sm = re.match(r"(?is)^\s*SELECT\s+(DISTINCT\b(?!\s+ON))?", body)
    fm = next(
        (
            m
            for m in re.finditer(r"(?i)\bFROM\b", body)
            if m.start() < qm.start() and depth[m.start()] == 0
        ),
        None,
    )
    if sm is None or fm is None:
        return sql
    tail_start = next(
        (
            m.start()
            for m in re.finditer(
                r"(?i)\b(ORDER\s+BY|LIMIT|OFFSET|FETCH)\b", body
            )
            if m.start() > qm.end() and depth[m.start()] == 0
        ),
        len(body),
    )
    select_list = body[sm.end() : fm.start()].strip()
    from_mid = body[fm.start() : qm.start()].strip()
    pred = body[qm.end() : tail_start].strip()
    tail = body[tail_start:].strip()
    distinct = "DISTINCT " if sm.group(1) else ""
    out = (
        f"SELECT {distinct}* EXCEPT (__qualify) FROM "
        f"(SELECT {select_list}, ({pred}) AS __qualify {from_mid}) "
        f"WHERE __qualify"
    )
    return out + (" " + tail if tail else "")


def _rewrite_window_filter(sql: str) -> str:
    """``agg(args) FILTER (WHERE pred) OVER ...`` ->
    ``agg(CASE WHEN pred THEN args END) OVER ...`` — pg/DuckDB allow
    FILTER on window aggregates, Spark rejects it ("Window aggregate
    function with filter predicate is not supported yet"); the CASE
    argument is the exact equivalent (aggregates skip NULLs).
    ``COUNT(*)`` maps to ``COUNT(CASE WHEN pred THEN 1 END)``; DISTINCT
    stays outside the CASE. Group-by FILTER (no OVER after it) is left
    alone — Spark supports that natively."""
    filter_re = re.compile(r"\bFILTER\s*\(", re.IGNORECASE)
    pos = 0
    while True:
        m = filter_re.search(sql, pos)
        if not m:
            return sql
        depth, i = 1, m.end()
        while i < len(sql) and depth:
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
            i += 1
        if depth:
            return sql
        wm = re.match(r"(?is)^WHERE\s+(.*)$", sql[m.end() : i - 1].strip())
        after = sql[i:]
        if not wm or not re.match(r"\s*OVER\b", after, re.IGNORECASE):
            pos = m.end()
            continue
        pred = wm.group(1).strip()
        j = m.start() - 1
        while j >= 0 and sql[j].isspace():
            j -= 1
        if j < 0 or sql[j] != ")":
            pos = m.end()
            continue
        depth, k = 0, j
        while k >= 0:
            if sql[k] == ")":
                depth += 1
            elif sql[k] == "(":
                depth -= 1
                if depth == 0:
                    break
            k -= 1
        fm = _IDENT_TAIL.search(sql, 0, k)
        if k < 0 or not fm or fm.end() != k:
            pos = m.end()
            continue
        fn = sql[fm.start() : k]
        args = sql[k + 1 : j].strip()
        dm = re.match(r"(?is)^DISTINCT\s+(.*)$", args)
        if args == "*":
            body = f"CASE WHEN {pred} THEN 1 END"
        elif dm:
            body = f"DISTINCT CASE WHEN {pred} THEN {dm.group(1).strip()} END"
        else:
            body = f"CASE WHEN {pred} THEN {args} END"
        sql = sql[: fm.start()] + f"{fn}({body}) " + after.lstrip()
        pos = fm.start()


def _rewrite_qualify_recursive(sql: str) -> str:
    """Apply ``_rewrite_qualify`` at every nesting level, innermost
    first: QUALIFY inside a derived table or a CTE body sits at relative
    depth 0 of some parenthesized SELECT, so rewriting parenthesized
    SELECT bodies until fixpoint, then the top level, covers all of
    them."""
    while re.search(r"(?i)\bQUALIFY\b", sql):
        changed = False
        stack: list = []
        for i, ch in enumerate(sql):
            if ch == "(":
                stack.append(i)
            elif ch == ")" and stack:
                start = stack.pop()
                inner = sql[start + 1 : i]
                if re.match(r"(?is)\s*SELECT\b", inner) and re.search(
                    r"(?i)\bQUALIFY\b", inner
                ):
                    new_inner = _rewrite_qualify(inner)
                    if new_inner != inner:
                        sql = sql[: start + 1] + new_inner + sql[i:]
                        changed = True
                        break
        if not changed:
            break
    return _rewrite_qualify(sql)


def _rewrite_between_symmetric(sql: str) -> str:
    """pg's ``BETWEEN SYMMETRIC a AND b`` auto-swaps misordered bounds
    (reference parses it, kv/CalciteSqlParser.java:342-357); Spark has no
    SYMMETRIC keyword -> ``BETWEEN least(a,b) AND greatest(a,b)``. The
    NOT form needs no special case (NOT precedes BETWEEN)."""
    return _BETWEEN_SYM.sub(
        lambda m: (
            f"BETWEEN least({m.group(1)}, {m.group(2)})"
            f" AND greatest({m.group(1)}, {m.group(2)})"
        ),
        sql,
    )


_WITH_TIES = re.compile(
    r"\bFETCH\s+(?:FIRST|NEXT)\s+(?:(\d+)\s+)?ROWS?\s+WITH\s+TIES\b",
    re.IGNORECASE,
)


def _rewrite_with_ties(sql: str) -> str:
    """``ORDER BY keys FETCH FIRST n ROWS WITH TIES`` (pg / SQL standard;
    Spark has no WITH TIES) -> a RANK() window filter: rows ranked <= n
    under the same ordering, so boundary ties survive exactly as pg
    keeps them. The body is wrapped as a subquery, which means the ORDER
    BY keys must be projected output columns (pg can additionally order
    by unprojected columns; that form raises in Spark's analyzer rather
    than silently changing semantics). Depth-0 occurrence only —
    subquery bodies pass through untouched."""
    m = _WITH_TIES.search(sql)
    if not m:
        return sql
    depth = _paren_depth(sql)
    while m and depth[m.start()] != 0:
        m = _WITH_TIES.search(sql, m.end())
    if not m:
        return sql
    n = int(m.group(1) or 1)  # pg defaults the count to 1
    head, tail = sql[: m.start()].rstrip(), sql[m.end() :]
    ob = None
    for mo in re.finditer(r"\bORDER\s+BY\b", head, flags=re.IGNORECASE):
        if depth[mo.start()] == 0:
            ob = mo
    if ob is None:
        raise ValueError("FETCH ... WITH TIES requires ORDER BY")
    keys = head[ob.end() :].strip()
    body = head[: ob.start()].rstrip()
    return (
        f"SELECT * EXCEPT (__ties_rk) FROM (SELECT *, RANK() OVER "
        f"(ORDER BY {keys}) AS __ties_rk FROM ({body})) "
        f"WHERE __ties_rk <= {n} ORDER BY {keys}{tail}"
    )


def _rewrite_fetch_first(sql: str) -> str:
    """SQL-standard/pg row limiting -> Spark's LIMIT/OFFSET spelling:
    ``OFFSET m [ROWS] FETCH FIRST|NEXT n ROWS ONLY`` -> ``LIMIT n OFFSET
    m`` (Spark requires LIMIT before OFFSET), plus the standalone forms."""
    sql = re.sub(
        r"\bOFFSET\s+(\d+)(?:\s+ROWS?)?\s+"
        r"FETCH\s+(?:FIRST|NEXT)\s+(?:(\d+)\s+)?ROWS?\s+ONLY\b",
        lambda m: f"LIMIT {m.group(2) or 1} OFFSET {m.group(1)}",
        sql,
        flags=re.IGNORECASE,
    )
    sql = re.sub(
        r"\bFETCH\s+(?:FIRST|NEXT)\s+(?:(\d+)\s+)?ROWS?\s+ONLY\b",
        lambda m: f"LIMIT {m.group(1) or 1}",  # pg defaults the count to 1
        sql,
        flags=re.IGNORECASE,
    )
    return re.sub(
        r"\bOFFSET\s+(\d+)\s+ROWS?\b",
        lambda m: f"OFFSET {m.group(1)}",
        sql,
        flags=re.IGNORECASE,
    )


_QUANT_RE = re.compile(
    r"(!=|<>|<=|>=|=|<|>)\s*(ALL|ANY|SOME)\s*\(\s*(?=SELECT\b|WITH\b)",
    re.IGNORECASE,
)

# (op, quantifier) -> aggregate that decides the comparison with ONE
# scalar instead of a per-row quantified loop (Spark has no ALL/ANY
# subquery comparisons). The ANY aggregates are TRUE-exact as-is (empty
# -> MIN/MAX NULL -> UNKNOWN, matching pg's FALSE under WHERE; NULL
# elements are ignored by the aggregate exactly as pg's ANY ignores
# non-satisfying UNKNOWNs). The ALL aggregates alone are NOT exact on
# empty sets (pg: TRUE, agg rewrite: UNKNOWN) or NULL elements (pg:
# never-TRUE, agg: may be TRUE), so ALL gets empty/null guard clauses
# when the left operand is a capturable simple expression — see
# `_rewrite_quantified`. `= ANY` / `<> ALL` use IN / NOT IN (exact,
# incl. NULLs).
_QUANT_AGG = {
    (">", "ALL"): "MAX", (">=", "ALL"): "MAX",
    ("<", "ALL"): "MIN", ("<=", "ALL"): "MIN",
    (">", "ANY"): "MIN", (">=", "ANY"): "MIN",
    ("<", "ANY"): "MAX", ("<=", "ANY"): "MAX",
}

# A simple left operand ending right before the comparison operator:
# column ref, one-level function call, one-level parenthesized
# expression, or a masked literal. `$` anchors at the endpos passed to
# .search(), i.e. the operator's start.
_QUANT_LHS = re.compile(_OPERAND + r"\s*$")

# If the char just before the captured operand is part of a larger
# arithmetic/concat expression, the operand is only a fragment (e.g.
# `a + 1 > ALL(...)` captures `1`) — wrapping it in the guarded form
# would change grouping, so fall back to the plain agg rewrite there.
_EXPR_CONT = set("+-*/%^|&")


def _rewrite_quantified(sql: str) -> str:
    """pg/standard quantified comparison subqueries -> Spark spellings
    (Spark has no ALL/ANY subquery comparisons):

    - ``x = ANY (sub)`` -> ``x IN (sub)``; ``x <> ALL (sub)`` ->
      ``x NOT IN (sub)`` — exact, including NULL semantics.
    - ``x > ANY (sub)`` (and <, <=, >=) -> ``x > (SELECT MIN(__qv) FROM
      (sub) __q(__qv))`` — TRUE-exact under WHERE for every input
      (empty set and NULL elements both land on UNKNOWN == no-row).
    - ``x > ALL (sub)`` (and <, <=, >=) -> the guarded form
      ``((SELECT COUNT(*) FROM sub) = 0 OR ((SELECT COUNT(*) -
      COUNT(__qv) FROM sub) = 0 AND x > (SELECT MAX(__qv) FROM sub)))``
      — TRUE-exact under WHERE: empty -> TRUE (pg), NULL elements ->
      never TRUE (pg). Catalyst's ReuseSubquery collapses the repeated
      scalar aggregates at execution. Needs the left operand captured
      (`_QUANT_LHS`) to parenthesize the whole predicate; when the
      operand is an uncapturable expression fragment, falls back to the
      bare agg rewrite whose empty/NULL divergence is the documented
      edge (same class as TRY_CAST's fractional strings).

    The remaining divergence of the guarded form is TRUE-equivalence
    only: in a SELECT list or under NOT, pg's UNKNOWN becomes FALSE
    here. SOME is ANY's standard synonym. Runs on the MASKED statement;
    only fires when '(' opens a SELECT/WITH, so pg's ``= ANY('{array
    literal}')`` (a masked placeholder) never matches."""
    out, pos = [], 0
    while True:
        m = _QUANT_RE.search(sql, pos)
        if not m:
            out.append(sql[pos:])
            return "".join(out)
        op = {"<>": "!="}.get(m.group(1), m.group(1))
        quant = "ANY" if m.group(2).upper() == "SOME" else m.group(2).upper()
        # balanced-paren extraction of the subquery body
        open_i = sql.index("(", m.end(2))
        depth, i = 0, open_i
        for i in range(open_i, len(sql)):
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
                if depth == 0:
                    break
        if depth != 0:
            raise ValueError(f"unbalanced quantified subquery: {sql[m.start():m.start()+60]}")
        sub = sql[open_i + 1:i]
        start = m.start()
        repl = None
        if (op, quant) in _QUANT_AGG:
            agg = _QUANT_AGG[(op, quant)]
            bare = f"{m.group(1)} (SELECT {agg}(__qv) FROM ({sub}) __q(__qv))"
            lhs = None
            if quant == "ALL":
                lm = _QUANT_LHS.search(sql, pos, m.start())
                if lm:
                    j = lm.start(1) - 1
                    while j >= 0 and sql[j].isspace():
                        j -= 1
                    if j < 0 or sql[j] not in _EXPR_CONT:
                        lhs = lm.group(1)
                        start = lm.start(1)
            if lhs is not None:
                repl = (
                    f"((SELECT COUNT(*) FROM ({sub}) __q(__qv)) = 0"
                    f" OR ((SELECT COUNT(*) - COUNT(__qv) FROM ({sub})"
                    f" __q(__qv)) = 0"
                    f" AND {lhs} {bare}))"
                )
            else:
                repl = bare
        elif (op, quant) == ("=", "ANY"):
            repl = f"IN ({sub})"
        elif (op, quant) == ("!=", "ALL"):
            repl = f"NOT IN ({sub})"
        else:
            raise ValueError(
                f"unsupported quantified comparison: {op} {quant}"
            )
        out.append(sql[pos:start])
        out.append(repl)
        pos = i + 1


def preprocess(sql: str) -> str:
    """Rewrite pg-flavored SQL into Spark SQL (queries & expressions)."""
    masked, lits = _mask_literals(sql)
    masked = _rewrite_json_ops(masked, lits)
    masked = _rewrite_casts(masked)
    masked = _rewrite_regex_match(masked)
    masked = _rewrite_between_symmetric(masked)
    masked = _rewrite_with_ties(masked)
    masked = _rewrite_fetch_first(masked)
    masked = _rewrite_tablesample(masked)
    masked = _rewrite_distinct_on(masked)
    masked = _rewrite_quantified(masked)
    masked = _rewrite_window_filter(masked)
    masked = _rewrite_qualify_recursive(masked)
    for pat, repl in _FUNC_ALIASES.items():
        masked = re.sub(pat, repl, masked, flags=re.IGNORECASE)
    return _unmask(masked, lits)
