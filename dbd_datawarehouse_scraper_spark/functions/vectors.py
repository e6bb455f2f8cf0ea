"""[EXT] Vector math over array<float> embedding columns.

Built-in higher-order functions (zip_with / aggregate) keep the math
JVM-side; accumulation is in double and strictly left-to-right, so
results are deterministic and reproducible across engines (the DuckDB
oracle sums in the same index order via UNNEST WITH ORDINALITY).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two equal-length float arrays, double accumulator."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 for zero-norm inputs."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0, F.lit(0.0)).otherwise(dot(a, b) / denom)


def qdot(a: Column, b: Column, scale: float = 1e12) -> Column:
    """Cross-engine-exact dot product: each component product is
    quantized to a bigint (round(x·y·scale) — IEEE-identical in any
    engine), then summed exactly. Use for oracle-facing queries; the
    plain ``dot`` is the fast path."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: F.round(
                x.cast("double") * y.cast("double") * F.lit(scale)
            ).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def qcosine(a: Column, b: Column) -> Column:
    """Cross-engine-exact cosine: quantized dot / sqrt(quantized norms).
    The 1e12 scales cancel, so no rescaling is needed."""
    d = qdot(a, b)
    na = qdot(a, a)
    nb = qdot(b, b)
    return F.when((na == 0) | (nb == 0), F.lit(0.0)).otherwise(
        d.cast("double") / (F.sqrt(na.cast("double")) * F.sqrt(nb.cast("double")))
    )
