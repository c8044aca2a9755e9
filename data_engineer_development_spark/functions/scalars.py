"""Scalar / aggregate expression helpers (SURVEY.md §2.9, §2.5).

All helpers return JVM-side Column expressions (whole-stage-codegen eligible);
no Python UDFs. Each mirrors a reference construct, cited per function.

Determinism note (drives the oracle contract): floating-point SUM/AVG are
computed over ``DECIMAL(20,4)`` casts and converted back to DOUBLE at the end.
Decimal addition is exact and order-independent, so a 32-partition Spark sum
and a single-threaded DuckDB sum produce bit-identical doubles — a plain
double sum would differ in the low bits by accumulation order and break
value-hash comparison. The same cast chain must appear in the oracle SQL
(``CAST(SUM(CAST(x AS DECIMAL(20,4))) AS DOUBLE)``).
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(20,4)"


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(col: str | Column, alias: str) -> Column:
    """Order-independent double sum (exact decimal accumulation)."""
    return F.sum(_c(col).cast(DEC)).cast("double").alias(alias)


def davg(col: str | Column, alias: str) -> Column:
    """avg = exact decimal sum / count, divided in IEEE double (deterministic
    given identical operands on both engines)."""
    return (
        F.sum(_c(col).cast(DEC)).cast("double") / F.count(_c(col))
    ).alias(alias)


def sentinel_to_null(col: str | Column, sentinels: Iterable[str]) -> Column:
    """P5+F1: sentinel-value null cleansing.

    The reference maps ``'-8'`` (and ``'0'``, stray letter codes) to NULL with
    ``CASE WHEN x IN (...) THEN NULL ELSE x END`` on every quality-zone column
    (/root/reference/airflow-dags/export_svg.py:211-244).
    """
    c = _c(col)
    return F.when(c.isin(list(sentinels)), F.lit(None)).otherwise(c)


def decode_map(col: str | Column, mapping: Mapping[str, str]) -> Column:
    """F1 (decode flavor): code→name CASE with no ELSE ⇒ NULL for unknown
    codes, exactly the dimension-decode semantics of export_svg.py:278-290
    (DimCircuit) and the 14 sibling dims."""
    c = _c(col)
    expr: Column | None = None
    for code, name in mapping.items():
        expr = F.when(c == code, name) if expr is None else expr.when(c == code, name)
    assert expr is not None, "decode_map needs at least one mapping entry"
    return expr


def split_date_parts_to_date(col: str | Column, sep: str = "/") -> Column:
    """F3+F4+F5: ``DATE(CONCAT(SPLIT(s,'/')[OFFSET(2)],'-',[0],'-',[1]))`` —
    the reference's M/D/YYYY → DATE rebuild (export_svg.py:216-217,228,232-233).
    BigQuery OFFSET(n) is 0-based like Spark element access.

    Uses ``F.get`` (NULL on out-of-bounds under ANY ANSI setting) rather than
    ``getItem``: sentinel-filled cells like ``'-8'`` split to a 1-element array,
    and ``getItem(2)`` throws INVALID_ARRAY_INDEX under Spark 4's default
    ANSI-on session while returning NULL under ANSI-off — the driver gate runs
    ANSI on, so the expression must be ANSI-safe.
    ``concat_ws`` skips NULLs, so a short array would yield a partial string
    like ``'-8'``; ANSI-on ``to_date`` throws on that, so parse with
    ``try_to_date`` (NULL on failure under any ANSI setting) behind a size
    guard — malformed inputs map to NULL everywhere, matching the ANSI-off
    behavior the oracle expects."""
    parts = F.split(_c(col), sep)
    iso = F.concat_ws("-", F.get(parts, 2), F.get(parts, 0), F.get(parts, 1))
    return F.when(F.size(parts) == 3, F.try_to_date(iso, "yyyy-M-d"))


def base64_json(*cols: Column | str) -> Column:
    """F9: message envelope = base64(JSON payload)
    (/root/reference/airflow-dags/transfer_sercom_files.py:120)."""
    return F.base64(F.to_json(F.struct(*[_c(c) for c in cols])).cast("binary"))


def strip_nul(col: str | Column) -> Column:
    """F10: NUL-byte strip, the ``tr '\\0' ' '`` analogue (export_svg.py:110)."""
    return F.regexp_replace(_c(col), "\\x00", " ")
