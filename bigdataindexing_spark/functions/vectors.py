"""Vector Column expressions over ``array<float>`` embeddings.

Built-in higher-order functions only (``zip_with``/``aggregate``/
``transform``) — the dot product and norms run JVM-side per row with no
Python round-trip, which is the fast path for brute-force similarity. A
vectorized pandas-UDF variant exists in operators/similarity.py for very
wide vectors where Arrow batching wins.

Each helper takes either a COLUMN-NAME STRING or a Column. Prefer the
string form in hot builders: it assembles the whole expression as one SQL
fragment parsed in a single py4j call, where the Column-lambda form costs
a dozen driver round-trips per invocation (measured ~0.2s per builder at
suite scale — driver-side, repeated per query construction).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column | str) -> Column:
    return F.col(vec).cast("array<double>") if isinstance(vec, str) else vec.cast(
        "array<double>"
    )


def _dot_sql(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0D, (s, v) -> s + v)"
    )


def _norm_sql(a: str) -> str:
    return f"sqrt(aggregate(transform({a}, x -> x * x), 0.0D, (s, v) -> s + v))"


def dot(a: Column | str, b: Column | str) -> Column:
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(_dot_sql(a, b))
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v
    )


def norm(a: Column | str) -> Column:
    if isinstance(a, str):
        return F.expr(_norm_sql(a))
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, v: s + v)
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity of two double arrays."""
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(
            f"{_dot_sql(a, b)} / ({_norm_sql(a)} * {_norm_sql(b)})"
        )
    return dot(a, b) / (norm(a) * norm(b))
