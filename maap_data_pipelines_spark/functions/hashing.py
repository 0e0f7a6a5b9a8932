"""Deterministic, engine-portable hashing primitives.

Everything is built on md5 so results are bit-identical between Spark and any
ANSI-SQL oracle (DuckDB): ``conv(substr(md5(x),1,15),16,10)`` in Spark equals
``('0x'||substr(md5(x),1,15))::BIGINT`` in DuckDB. 15 hex chars = 60 bits,
always positive, no overflow in BIGINT arithmetic.

MinHash permutations use the classic universal-hash family
``h_i(x) = (a_i*x + b_i) mod P`` with P = 2^31-1 (Mersenne), so every
intermediate product stays < 2^62 and is exact in int64 on both engines.

Scale note: all of these are pure column expressions — whole-stage codegen
keeps them JVM-side; no Python ever touches row data.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE_31 = 2_147_483_647  # 2^31 - 1


def md5_long(col: Column) -> Column:
    """60-bit positive integer hash of a string column (portable)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def md5_long_sql(expr: str) -> str:
    """DuckDB SQL rendering of :func:`md5_long` for oracle parity."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def minhash_coeffs(num_perm: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the permutation family.

    a must be odd and non-zero mod P; derived from the permutation index so
    both engines can regenerate them without any RNG.
    """
    return [(2 * i + 1, (i * 0x9E3779B1) % MERSENNE_31) for i in range(num_perm)]


def perm_hash(base: Column, a: int, b: int) -> Column:
    """(a*x + b) mod P on a 60-bit base hash, exact in int64."""
    return (base % MERSENNE_31 * F.lit(a) + F.lit(b)) % MERSENNE_31


def perm_hash_sql(base_expr: str, a: int, b: int) -> str:
    return f"((({base_expr}) % {MERSENNE_31}) * {a} + {b}) % {MERSENNE_31}"
