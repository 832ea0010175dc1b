"""Central registry of declared queries (SURVEY.md §2).

Each :class:`QuerySpec` carries a DataFrame builder ``(spark, sf_dir) ->
DataFrame`` and, where the semantics are ANSI-SQL-expressible, the duckdb
oracle SQL the driver hash-matches against. Non-SQL-expressible operators
(stateful streaming, LSH candidate generation, document-pipeline contracts)
register with ``oracle=None`` and are verified by pytest contracts instead.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None
    tags: tuple[str, ...] = ()
    bench: bool = True  # include in bench.py headline timing
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None,
    tags: tuple[str, ...] = (),
    bench: bool = True,
    doc: str = "",
) -> Callable[[Builder], Builder]:
    def deco(fn: Builder) -> Builder:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(
            name=name, builder=fn, oracle=oracle, tags=tags, bench=bench,
            doc=doc or (fn.__doc__ or ""),
        )
        return fn

    return deco


def all_specs() -> dict[str, QuerySpec]:
    _ensure_loaded()
    return dict(_REGISTRY)


def queries() -> dict[str, Builder]:
    return {n: s.builder for n, s in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {n: s.oracle for n, s in all_specs().items() if s.oracle is not None}


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from bigdataindexing_spark.operators import (  # noqa: F401
        relational,
        semistructured,
        text_analysis,
        dedup,
        similarity,
        multimodal,
        skew,
        grouped_python,
    )
    from bigdataindexing_spark.plans import sql  # noqa: F401
    from bigdataindexing_spark.documents import contracts  # noqa: F401
    from bigdataindexing_spark.index import rollup, search  # noqa: F401
    from bigdataindexing_spark.sources import json_ingest  # noqa: F401
    from bigdataindexing_spark.streaming import queries, stateful  # noqa: F401

    _LOADED = True
