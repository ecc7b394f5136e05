"""Vector column helpers (JVM-side, codegen-friendly).

Embeddings arrive as ``array<float>``; all arithmetic widens to double
element-wise before multiply/accumulate so Spark and the DuckDB oracle
(``x[i]::DOUBLE``) see identical values. ``F.aggregate`` folds sequentially
over the array — the same left-to-right order the oracle's indexed sum uses —
keeping results reproducible across partitionings.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm2(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm2(a) * norm2(b))
