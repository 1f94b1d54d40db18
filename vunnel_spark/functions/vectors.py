"""Vector math over array<float> embedding columns — pure Catalyst.

Dot products / norms / cosine via F.zip_with + F.aggregate: stays in
codegen, no Python crossing, and (critically for oracle comparison)
accumulates left-to-right in double precision — the same order DuckDB's
list functions use, so results match bit-for-bit before rounding.

At 100 TB scale the brute-force form is the verification baseline; the
LSH-bucketed form in operators/similarity.py is the scale path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm2(a: Column) -> Column:
    """Squared L2 norm."""
    return F.aggregate(
        a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / F.sqrt(norm2(a) * norm2(b))


def l2_distance(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(
                a, b,
                lambda x, y: (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
