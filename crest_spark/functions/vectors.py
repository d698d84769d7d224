"""Vector (embedding-column) expressions — pure Catalyst, no Python UDFs.

Embeddings are ``array<float>`` columns. All math uses Spark higher-order
functions (``zip_with`` / ``aggregate``), which execute JVM-side inside
whole-stage codegen: a sequential left-fold over the array, deterministic
per row, no Python worker round-trip. For heavy all-pairs workloads the
similarity operators switch to Arrow-batched numpy (see
``crest_spark.operators.similarity``); these expressions are the
per-row / moderate-k path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(col: Column) -> Column:
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<numeric> columns (sequential fold, JVM-side)."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_as_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL-safe on zero-norm vectors (returns NULL)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0.0, dot(a, b) / denom)
