"""Synthetic-but-valid cell ids derived from lineitem keys, built with
arithmetic BOTH Spark and DuckDB evaluate identically.

These let every post-encode cell-algebra operator (parent / level /
range / token / rollup / alignment joins — SURVEY.md §2.2) be checked
against the DuckDB oracle with a full value-hash, independent of the
Hilbert encoder (which has its own parity/property tests): the algebra
is pure bit math, so it works on any *valid* id bit pattern.

Construction (level-12 ids covering all 6 faces incl. the sign bit):
    face  = l_orderkey % 6
    pos24 = (l_orderkey * 2654435761 + l_partkey * 97 + l_suppkey)
            % 16777216
    id    = face·2^61 + pos24·2^37 + 2^36
The face·2^61 term is written as INT64_MIN + (face-4)·2^61 for faces
4–5 because DuckDB raises on << overflow (Spark ANSI likewise on *).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

LEVEL = 12
POS_SHIFT = 2 ** 37
MARKER = 2 ** 36
FACE_SHIFT = 2 ** 61
INT64_MIN = -(2 ** 63)


def synth_cell_col() -> Column:
    """Spark Column: the synthetic level-12 cell id."""
    face = F.col("l_orderkey") % F.lit(6)
    pos24 = (F.col("l_orderkey") * F.lit(2654435761)
             + F.col("l_partkey") * F.lit(97)
             + F.col("l_suppkey")) % F.lit(16777216)
    base = F.when(face >= 4,
                  F.lit(INT64_MIN) + (face - F.lit(4)) * F.lit(FACE_SHIFT)) \
        .otherwise(face * F.lit(FACE_SHIFT))
    return base + pos24 * F.lit(POS_SHIFT) + F.lit(MARKER)


SYNTH_CELL_SQL = f"""
CASE WHEN (l_orderkey % 6) >= 4
     THEN (-9223372036854775807 - 1)
          + ((l_orderkey % 6) - 4) * {FACE_SHIFT}
     ELSE (l_orderkey % 6) * {FACE_SHIFT} END
+ ((l_orderkey * 2654435761 + l_partkey * 97 + l_suppkey) % 16777216)
  * {POS_SHIFT} + {MARKER}
"""


def parent_sql(id_sql: str, level: int) -> str:
    """DuckDB twin of columns.parent (bit math on int64)."""
    lsb = 1 << (2 * (30 - level))
    return f"(({id_sql}) & {-lsb}) | {lsb}"


def range_min_sql(id_sql: str) -> str:
    return f"(({id_sql}) - ((({id_sql}) & -({id_sql})) - 1))"


def range_max_sql(id_sql: str) -> str:
    return f"(({id_sql}) + ((({id_sql}) & -({id_sql})) - 1))"


def level_sql(id_sql: str) -> str:
    return f"(30 - bit_count((({id_sql}) & -({id_sql})) - 1) // 2)"


def token_sql(id_sql: str) -> str:
    return ("regexp_replace(lower(lpad(to_hex(" + id_sql
            + "), 16, '0')), '0+$', '')")


def sortable_sql(id_sql: str) -> str:
    return f"xor(({id_sql}), (-9223372036854775807 - 1))"


_Q62 = 1 << 62  # wrap offset 6<<61 in sortable space


def next_sql(id_sql: str) -> str:
    """DuckDB twin of columns.next_cell (sortable space — raw id+2lsb
    overflows int64 at the face-3/4 sign crossing)."""
    s_n = f"({sortable_sql(id_sql)} + 2 * (({id_sql}) & -({id_sql})))"
    return sortable_sql(s_n)


def prev_sql(id_sql: str) -> str:
    """DuckDB twin of columns.prev_cell."""
    l2 = f"(2 * (({id_sql}) & -({id_sql})))"
    s = sortable_sql(id_sql)
    return (f"CASE WHEN {s} >= (-9223372036854775807 - 1) + {l2} "
            f"THEN {sortable_sql(f'({s} - {l2})')} "
            f"ELSE ({id_sql}) - {l2} END")


def next_wrap_sql(id_sql: str) -> str:
    """DuckDB twin of columns.next_wrap (single-subtraction wrap)."""
    s_n = f"({sortable_sql(id_sql)} + 2 * (({id_sql}) & -({id_sql})))"
    return (f"CASE WHEN {s_n} >= {_Q62} THEN {s_n} - {_Q62} "
            f"ELSE {sortable_sql(s_n)} END")


def prev_wrap_sql(id_sql: str) -> str:
    """DuckDB twin of columns.prev_wrap."""
    l2 = f"(2 * (({id_sql}) & -({id_sql})))"
    s = sortable_sql(id_sql)
    return (f"CASE WHEN {s} < (-9223372036854775807 - 1) + {l2} "
            f"THEN ((({id_sql}) - {l2}) - {_Q62}) "
            f"ELSE {sortable_sql(f'({s} - {l2})')} END")


def child_position_sql(id_sql: str, level: int) -> str:
    """DuckDB twin of columns.child_position: arithmetic shift plus a
    mask to discard the sign-extension bits."""
    shift = 2 * (30 - level) + 1
    mask = (1 << (64 - shift)) - 1
    return f"CAST(((({id_sql}) >> {shift}) & {mask}) & 3 AS INT)"


def advance_wrap_sql(id_sql: str, n: int, level: int) -> str:
    """DuckDB twin of columns.advance_wrap: position via masked shift,
    modular step, re-materialized with the INT64_MIN face-offset CASE
    (DuckDB raises on << overflow, so faces 4-5 can't be shifted)."""
    shift = 2 * (30 - level) + 1
    pos_mask = (1 << (64 - shift)) - 1
    total = 6 * (4 ** level)
    per_face = 4 ** level
    lsb = 1 << (2 * (30 - level))
    pos = f"(((({id_sql}) >> {shift}) & {pos_mask}) + ({n}))"
    newpos = f"((({pos}) % {total} + {total}) % {total})"
    face = f"(({newpos}) // {per_face})"
    inface = f"(({newpos}) % {per_face})"
    return (f"(CASE WHEN {face} >= 4 THEN (-9223372036854775807 - 1) "
            f"+ ({face} - 4) * {1 << 61} ELSE {face} * {1 << 61} END "
            f"+ {inface} * {2 * lsb} + {lsb})")
