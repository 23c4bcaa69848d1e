"""Vector math over ``array<float>`` embedding columns.

Built-in higher-order functions (zip_with + aggregate) keep the arithmetic
JVM-side; elements are widened to double before accumulating so results are
deterministic and engine-comparable. For very wide vectors or very hot paths
a Pandas-UDF (numpy dot over Arrow batches) is the upgrade path — see
operators/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Left-to-right fold of elementwise products, in double.

    Caller contract: equal-length arrays with non-NULL elements —
    zip_with NULL-pads the shorter side, and the fold's non-nullable
    init would silently decay that NULL state to 0.0.
    """
    # fold-state: caller contract above; non-nullable double init
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    # fold-state: non-NULL elements per dot()'s caller contract;
    # non-nullable double init
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
