"""PostgreSQL-isms -> Spark SQL preprocessing.

The design principle (SURVEY §7.1): no hand-written SQL parser or
interpreter — Catalyst is the parser/analyzer/optimizer. This module only
rewrites the handful of surface-level PostgreSQL constructs Spark SQL does
not accept, with targeted regexes:

- ``expr::type`` casts           -> CAST(expr AS type)  (+ pg type names)
- ``j ->> 'k'`` / ``j -> 'k'``   -> get_json_object(j, '$.k')
  (reference kv/JsonHelper.java:67-134)
- ``j #>> '{a,b}'`` / ``#>``     -> get_json_object(j, '$.a.b')
- ``j -> 0``                     -> get_json_object(j, '$[0]')
- ``x ~ 'pat'`` / ``!~``         -> RLIKE / NOT RLIKE
- type-name spellings (TEXT, BYTEA, INT4/8, SERIAL...) inside CAST

Everything else passes through verbatim to spark.sql().
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
    "INTERVAL": "STRING",
}

# an operand for the json/cast operators: qualified identifier, function
# call (no space before the paren — else `SELECT (expr)` would match) or
# parenthesized expression (one level), string literal
_OPERAND = r"(\([^()]*\)|[A-Za-z_][\w.]*\([^()]*\)|[A-Za-z_][\w.]*|'[^']*')"


def map_pg_type(t: str) -> str:
    """Map a pg type name (possibly with (p[,s]) suffix) to Spark DDL."""
    t = t.strip()
    m = re.match(r"([A-Za-z_ ]+?)\s*(\(\s*\d+\s*(?:,\s*\d+\s*)?\))?\s*$", t)
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


def _rewrite_casts(sql: str) -> str:
    # expr::type  (types may be dotted? no — word plus optional (p,s))
    # the optional second type word is restricted to the known two-word pg
    # types, otherwise `x::INT FROM t` would swallow the FROM keyword
    pat = re.compile(
        _OPERAND + r"\s*::\s*([A-Za-z_]+(?:\s+(?:PRECISION|VARYING|ZONE))?"
        r"(?:\s*\(\s*\d+\s*(?:,\s*\d+\s*)?\))?)",
        re.IGNORECASE,
    )
    prev = None
    while prev != sql:
        prev = sql
        sql = pat.sub(
            lambda m: f"CAST({m.group(1)} AS {map_pg_type(m.group(2))})", sql
        )
    return sql


def _json_path_from_literal(lit: str, nested: bool = False) -> str:
    inner = lit.strip()[1:-1]  # strip quotes
    if nested:  # '{a,b,c}' path
        parts = [p.strip() for p in inner.strip("{}").split(",") if p.strip()]
        return "$." + ".".join(parts)
    return f"$.{inner}"


def _rewrite_json_ops(sql: str) -> str:
    # #>> and #> (nested path) first, then ->> / -> (single key or index)
    def nested(m):
        return f"get_json_object({m.group(1)}, '{_json_path_from_literal(m.group(2), True)}')"

    sql = re.sub(
        _OPERAND + r"\s*#>{1,2}\s*('\{[^']*\}')", nested, sql
    )

    def scalar(m):
        return f"get_json_object({m.group(1)}, '{_json_path_from_literal(m.group(2))}')"

    prev = None
    while prev != sql:
        prev = sql
        sql = re.sub(_OPERAND + r"\s*->>?\s*('[^']*')", scalar, sql)
        # array index: j -> 0
        sql = re.sub(
            _OPERAND + r"\s*->>?\s*(\d+)",
            lambda m: f"get_json_object({m.group(1)}, '$[{m.group(2)}]')",
            sql,
        )
    return sql


def _rewrite_regex_match(sql: str) -> str:
    sql = re.sub(
        _OPERAND + r"\s*!~\s*('[^']*')",
        lambda m: f"{m.group(1)} NOT RLIKE {m.group(2)}",
        sql,
    )
    # `~` only when followed by a string literal (avoids bitwise-not clash)
    sql = re.sub(
        _OPERAND + r"\s*~\s*('[^']*')",
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
}


def preprocess(sql: str) -> str:
    """Rewrite pg-flavored SQL into Spark SQL (queries & expressions)."""
    sql = _rewrite_json_ops(sql)
    sql = _rewrite_casts(sql)
    sql = _rewrite_regex_match(sql)
    for pat, repl in _FUNC_ALIASES.items():
        sql = re.sub(pat, repl, sql, flags=re.IGNORECASE)
    return sql
