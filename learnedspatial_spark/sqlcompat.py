"""Cross-engine SQL literal helpers.

Spark SQL parses a bare ``10000.0`` as DECIMAL (exact numeric) while DuckDB
parses it as DOUBLE; an integer/decimal division then runs under decimal
semantics in Spark and produces different doubles than DuckDB.  Every float
literal in SQL that is shared between the engines goes through ``flit``:
a string->double cast, which is correctly rounded (IEEE-identical) in both.
"""

from __future__ import annotations


def flit(v: float) -> str:
    """Exact float64 literal valid and bit-identical in Spark SQL + DuckDB."""
    return f"cast('{float(v)!r}' as double)"
