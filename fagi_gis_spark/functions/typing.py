"""Literal type inference by regex — the reference's value typing.

Reference patterns (/root/reference/fagi-gis/src/main/java/gr/athenainnovation/imis/fusion/gis/utils/Patterns.java:115-127),
applied by VirtuosoImporter.compareTypes:807-826: INT, DATE, WORD, TEXT,
DECIMAL. Patterns kept dialect-portable (Java regex / RE2 / Python all
agree on this subset).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# order matters: first match wins (compareTypes checks in this order)
TYPE_PATTERNS: list[tuple[str, str]] = [
    ("int", r"^-?[0-9]+$"),
    ("decimal", r"^-?[0-9]+\.[0-9]+$"),
    ("date", r"^[0-9]{1,4}[-/\.][0-9]{1,2}[-/\.][0-9]{1,4}$"),
    ("word", r"^[A-Za-z]+$"),
]
DEFAULT_TYPE = "text"

_COMPILED = [(t, re.compile(p)) for t, p in TYPE_PATTERNS]


def infer_type_py(value: str | None) -> str:
    if value is None:
        return DEFAULT_TYPE
    for t, rx in _COMPILED:
        if rx.match(value):
            return t
    return DEFAULT_TYPE


def infer_type_col(value: Column) -> Column:
    """JVM column expression of the same inference."""
    expr = F.lit(DEFAULT_TYPE)
    for t, p in reversed(TYPE_PATTERNS):
        expr = F.when(value.rlike(p), t).otherwise(expr)
    return expr


def infer_type_sql(value_expr: str) -> str:
    """DuckDB oracle twin."""
    cases = " ".join(
        f"WHEN regexp_matches({value_expr}, '{p}') THEN '{t}'" for t, p in TYPE_PATTERNS
    )
    return f"CASE {cases} ELSE '{DEFAULT_TYPE}' END"
