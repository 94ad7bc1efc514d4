"""Shared result-comparison helpers (used by scripts/verify_local.py and
tests/) mirroring the driver's gate: row count, column names, and an
order-insensitive value multiset with floats normalized to 9 significant
digits.

``strict=True`` (verify_local --hash) reproduces the DRIVER's
representation-sensitive canonicalization instead: values are stringified
the way a fetch path renders them, so a DECIMAL that one engine ships with
trailing fractional zeros ('0.450000') and the other without ('0.45')
MISMATCHES even though the values are equal — the round-3 failure mode.
Under strict compare any Decimal crossing the boundary is itself flagged:
the engine's contract is that rounded outputs are CAST to DOUBLE on both
sides before they reach the hash.
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal


# Driver hash-boundary contract for oracle-checked entries (round-4
# postmortem): the driver's pandas-based hasher crashes on ARRAY/MAP
# output columns (TypeError: unhashable type 'list'), and DuckDB
# HUGEINT/DECIMAL oracle columns render float64-style on fetch
# ('448955.0' vs Spark's '448955') — value-equal but hash-red. Graded
# entries must ship scalars: serialize arrays (array_join /
# array_to_string) and CAST wide integers back to BIGINT on the oracle
# side.
FORBIDDEN_ORACLE_TYPES = ("HUGEINT", "DECIMAL")


def boundary_problems(spark_dtypes, duck_cols, duck_types) -> list[str]:
    """Contract violations for an oracle-checked entry's output schema.

    ``spark_dtypes``: ``df.dtypes`` pairs; ``duck_cols``/``duck_types``:
    the DuckDB relation's ``columns``/``types``.
    """
    problems = []
    for c, t in spark_dtypes:
        if t.startswith("array") or t.startswith("map"):
            problems.append(
                f"spark column {c} is {t} (driver hasher cannot hash it)"
            )
    for c, t in zip(duck_cols, duck_types):
        tu = str(t).upper()
        if any(f in tu for f in FORBIDDEN_ORACLE_TYPES):
            problems.append(
                f"oracle column {c} is {t} (fetch-representation drift)"
            )
    return problems


def norm(v, strict: bool = False):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, Decimal):
        if strict:
            # scaled-decimal rendering keeps trailing zeros — exactly what
            # a float64-style fetch on the other side would drop
            return f"DECIMAL:{v}"
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return 0.0
        return repr(v) if strict else float(f"{v:.9g}")
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(norm(x, strict) for x in v)
    return v


def multiset(rows, cols, strict: bool = False):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out: dict = {}
    for r in rows:
        key = tuple(norm(r[i], strict) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def compare(
    spark_rows, spark_cols, oracle_rows, oracle_cols, strict: bool = False
) -> list[str]:
    """Return a list of problems (empty == match)."""
    problems = []
    if len(spark_rows) != len(oracle_rows):
        problems.append(
            f"rowcount spark={len(spark_rows)} oracle={len(oracle_rows)}"
        )
    if sorted(c.lower() for c in spark_cols) != sorted(
        c.lower() for c in oracle_cols
    ):
        problems.append(
            f"columns spark={sorted(spark_cols)} oracle={sorted(oracle_cols)}"
        )
    if not problems:
        ms = multiset(spark_rows, spark_cols, strict)
        oms = multiset(oracle_rows, oracle_cols, strict)
        if ms != oms:
            diff = [k for k in ms if ms[k] != oms.get(k)][:3]
            odiff = [k for k in oms if oms[k] != ms.get(k)][:3]
            problems.append(
                f"values spark-only={diff} oracle-only={odiff}"
            )
    return problems
