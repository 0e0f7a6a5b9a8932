"""Vector math as JVM-side column expressions (no UDFs).

Embeddings are ``array<float>`` columns; dot products and norms are built
from ``zip_with`` + ``aggregate`` higher-order functions so they run inside
whole-stage codegen. At 100 TB scale this is the difference between a
CPU-bound codegen loop and an Arrow round-trip per batch.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_sql(a: str, b: str) -> str:
    """DuckDB rendering with identical left-fold evaluation order.

    ``list_reduce`` folds left like Spark's ``aggregate``; building the
    product list first keeps the op-for-op order identical, so doubles match
    to the last ulp (we still round final outputs to 6 dp for safety).
    """
    prod = f"list_transform(list_zip({a}, {b}), p -> p[1]::DOUBLE * p[2]::DOUBLE)"
    dot_ = f"list_reduce(list_prepend(0.0::DOUBLE, {prod}), (x, y) -> x + y)"
    na = f"sqrt(list_reduce(list_prepend(0.0::DOUBLE, list_transform({a}, x -> x::DOUBLE * x::DOUBLE)), (x, y) -> x + y))"
    nb = f"sqrt(list_reduce(list_prepend(0.0::DOUBLE, list_transform({b}, x -> x::DOUBLE * x::DOUBLE)), (x, y) -> x + y))"
    return f"(({dot_}) / (({na}) * ({nb})))"
