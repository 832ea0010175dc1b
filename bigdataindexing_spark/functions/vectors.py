"""Vector Column expressions over ``array<float>`` embeddings.

Built-in higher-order functions only (``zip_with``/``aggregate``/
``transform``) — the dot product and norms run JVM-side per row with no
Python round-trip, which is the fast path for brute-force similarity. A
vectorized pandas-UDF variant exists in operators/similarity.py for very
wide vectors where Arrow batching wins.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column | str) -> Column:
    return F.col(vec).cast("array<double>") if isinstance(vec, str) else vec.cast(
        "array<double>"
    )


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, v: s + v))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two double arrays."""
    return dot(a, b) / (norm(a) * norm(b))
