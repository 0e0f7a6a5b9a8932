"""Z-order (Morton) interleaved sort keys for multi-column data layout.

Sorting by one column clusters files tightly on that column and not at
all on any other; interleaving the bits of two columns gives a single
sort key whose ranges are small in BOTH dimensions, so min/max file
statistics prune scans filtered on either column. This is the layout
trick behind Delta/Iceberg Z-ORDER, expressed as a pure column
expression usable with ``repartitionByRange`` + ``sortWithinPartitions``
(see ``sinks.write_zordered``).

The interleave uses the magic-number bit-spread (4 shift/mask steps per
dimension) instead of a per-bit Add chain — a 64-term expression tree
risks janino's method limits (see operators/ann.py history), while this
is 8 tiny integer ops that stay inside whole-stage codegen. The DuckDB
rendering is the same arithmetic on BIGINT, so z-keys are oracle-exact.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# spread-masks for 16-bit -> every-other-bit-of-32
_SPREAD = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread16(c: Column) -> Column:
    x = c.cast("long").bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def zorder_key(a: Column, b: Column) -> Column:
    """32-bit Morton key interleaving the low 16 bits of two columns.

    Bit i of ``a`` lands at position 2i, bit i of ``b`` at 2i+1 — equal
    prefixes of the key correspond to quadtree cells, so a range of keys
    is a bounded rectangle in (a, b) space.
    """
    return _spread16(a).bitwiseOR(F.shiftleft(_spread16(b), 1)).cast("long")


def _spread16_sql(expr: str) -> str:
    x = f"(({expr})::BIGINT & 65535)"
    for shift, mask in _SPREAD:
        x = f"((({x} | ({x} << {shift})) & {mask}))"
    return x


def zorder_key_sql(a: str, b: str) -> str:
    """DuckDB rendering of :func:`zorder_key` (identical arithmetic)."""
    return f"({_spread16_sql(a)} | ({_spread16_sql(b)} << 1))"
