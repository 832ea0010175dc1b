"""Reusable text Column expressions — all built-in functions, no UDFs.

Everything here stays inside whole-stage codegen (JVM-side); the md5-based
hash is used where a hash must be reproducible in the duckdb oracle
(Spark's murmur3 ``F.hash`` is not available there).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization of lowercased text (matches duckdb
    ``string_split(lower(text), ' ')`` including empty-string behavior)."""
    return F.split(F.lower(text), " ")


def word_shingles(toks: Column, n: int = 3) -> Column:
    """Distinct n-word shingles of a token array.

    Caller must guarantee ``size(toks) >= n`` (filter first), and should
    pass a MATERIALIZED array column (``select(tokens(...).alias("t"))``
    first), never the raw ``tokens()`` expression: the input is
    referenced per shingle, so an unprojected expression re-runs the
    tokenizer inside every reference. One ``slice`` + ``array_join`` per
    shingle (1-based slice) rather than n ``get`` calls."""
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))
    )


def md5_long(col: Column | str) -> Column:
    """Deterministic 60-bit positive hash: first 15 hex chars of md5.

    Cross-engine reproducible: duckdb equivalent is
    ``CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)``.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")

