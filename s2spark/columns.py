"""Cell-id algebra as pure Spark Column expressions (zero UDF).

Every op here is closed-form int64 bit math, so Catalyst constant-folds
and whole-stage-codegens it — the JVM-side twin of
``s2spark.kernels.cellops`` (semantics: ``sphere.py :: CellId``,
SURVEY.md §2.2).

⚠️ Signedness: Spark LongType is signed; faces 4–5 set bit 63, so raw
ids from those faces are negative. Pure bit ops (&, |, ^, two's-
complement add/sub of in-range offsets) are representation-identical
to uint64, but *ordering* is not — any <, BETWEEN, or range partition
must use :func:`sortable` (sign-flip) first. All helpers below that
order ids do this internally.

ANSI-mode safety: for valid cell ids none of the arithmetic below can
overflow int64 (a valid id's lsb <= 2^60 and range_min/range_max stay
within the face's uint64 interval), so these expressions are safe with
``spark.sql.ansi.enabled=true`` (the Spark 4 default).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MAX_LEVEL = 30
SIGN_BIT = -0x8000000000000000  # int64 min == 1 << 63 as a bit pattern


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def lsb_for_level(level: int) -> int:
    return 1 << (2 * (MAX_LEVEL - level))


def sortable(cell_id: Column | str) -> Column:
    """uint64-order-preserving int64: ``id XOR (1<<63)``.

    Use for every <, BETWEEN, ORDER BY, or repartitionByRange on ids.
    """
    return _c(cell_id).bitwiseXOR(F.lit(SIGN_BIT))


def unsortable(cell_id_sortable: Column | str) -> Column:
    """inverse of :func:`sortable` (XOR is an involution)."""
    return _c(cell_id_sortable).bitwiseXOR(F.lit(SIGN_BIT))


def lsb(cell_id: Column | str) -> Column:
    """``id & -id`` — valid ids are never int64-min, so -id is safe."""
    cid = _c(cell_id)
    return cid.bitwiseAND(-cid)


def level(cell_id: Column | str) -> Column:
    """``CellId.level``: 30 - (count of trailing zeros)/2.

    trailing zeros = bit_count(lsb - 1); lsb <= 2^60 so lsb-1 is safe.
    """
    return (F.lit(MAX_LEVEL)
            - F.shiftright(F.bit_count(lsb(cell_id) - F.lit(1)), 1)
            ).cast("int")


def parent(cell_id: Column | str, lvl: int) -> Column:
    """``CellId.parent(level)`` — the tile-assignment op."""
    new_lsb = lsb_for_level(lvl)
    return _c(cell_id).bitwiseAND(F.lit(-new_lsb)).bitwiseOR(F.lit(new_lsb))


def range_min(cell_id: Column | str) -> Column:
    """``CellId.range_min``: id - (lsb - 1). Never overflows for valid ids."""
    cid = _c(cell_id)
    return cid - (lsb(cid) - F.lit(1))


def range_max(cell_id: Column | str) -> Column:
    """``CellId.range_max``: id + (lsb - 1)."""
    cid = _c(cell_id)
    return cid + (lsb(cid) - F.lit(1))


def contains(a: Column | str, b: Column | str) -> Column:
    """cell ``a`` contains cell ``b`` (``CellId.contains``) —
    sign-flipped BETWEEN on the leaf range."""
    bs = sortable(b)
    return bs.between(sortable(range_min(a)), sortable(range_max(a)))


def face(cell_id: Column | str) -> Column:
    """``CellId.face``: unsigned top 3 bits."""
    return F.shiftrightunsigned(_c(cell_id), 61).cast("int")


def is_leaf(cell_id: Column | str) -> Column:
    """``CellId.is_leaf``: trailing bit set."""
    return _c(cell_id).bitwiseAND(F.lit(1)) == F.lit(1)


def is_face(cell_id: Column | str) -> Column:
    return level(cell_id) == F.lit(0)


def is_valid(cell_id: Column | str) -> Column:
    """``CellId.is_valid``: face < 6 and lsb on an even bit position."""
    cid = _c(cell_id)
    return (face(cid) < F.lit(6)) & \
        (lsb(cid).bitwiseAND(F.lit(0x1555555555555555)) != F.lit(0))


def child(cell_id: Column | str, pos: int, lvl: int) -> Column:
    """``CellId.child(pos)`` for a cell known to be at level ``lvl - 1``
    (static levels keep this a pure codegen expression)."""
    old_lsb = lsb_for_level(lvl - 1)
    new_lsb = lsb_for_level(lvl)
    return _c(cell_id) - F.lit(old_lsb) + F.lit((2 * pos + 1) * new_lsb)


def children_array(cell_id: Column | str, lvl: int) -> Column:
    """array of the 4 children of a level ``lvl - 1`` cell."""
    return F.array(*[child(cell_id, p, lvl) for p in range(4)])


def child_begin(cell_id: Column | str, lvl: int) -> Column:
    cid = _c(cell_id)
    return cid - lsb(cid) + F.lit(lsb_for_level(lvl))


def child_end(cell_id: Column | str, lvl: int) -> Column:
    cid = _c(cell_id)
    return cid + lsb(cid) + F.lit(lsb_for_level(lvl))


def advance(cell_id: Column | str, n: Column | int) -> Column:
    """``CellId.advance(n)`` at the cell's own level (caller bounds n)."""
    cid = _c(cell_id)
    nn = F.lit(n) if isinstance(n, int) else n
    return cid + nn * (lsb(cid) * F.lit(2))


def token(cell_id: Column | str) -> Column:
    """``CellId.to_token``: 16-digit lowercase hex, trailing zeros
    stripped ('X' for the sentinel id 0)."""
    cid = _c(cell_id)
    hx = F.lower(F.lpad(F.hex(cid), 16, "0"))
    return F.when(cid == F.lit(0), F.lit("X")) \
        .otherwise(F.regexp_replace(hx, "0+$", ""))


def from_token(tok: Column | str) -> Column:
    """``CellId.from_token``: right-pad to 16 hex digits and parse.

    conv() with negative toBase emits the *signed* decimal of the
    64-bit pattern, so sign-bit tokens (faces 4–5) parse exactly.
    """
    t = _c(tok)
    padded = F.rpad(t, 16, "0")
    return F.when((t == F.lit("X")) | (t == F.lit("x")) | (t == F.lit("")),
                  F.lit(0).cast("long")) \
        .otherwise(F.conv(padded, 16, -10).cast("long"))
