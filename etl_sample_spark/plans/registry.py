"""Registry of oracle-checked queries.

Each query is a (Spark callable, ANSI-SQL oracle) pair. The Spark side is
a lazy DataFrame expression — Catalyst optimizes it; the oracle is run by
DuckDB on the same parquet and compared by row-count + schema +
order-insensitive value-hash (driver contract, ``__spark_entry__.py``).

Column-name discipline: every computed column is aliased identically on
both sides; floats are rounded identically on both sides so the
cross-engine value-hash is stable.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: SparkQuery
    oracle: str | None  # None → non-SQL-expressible; driver does rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    """Decorator: register a (spark, sf_dir) -> DataFrame query."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name=name, spark=fn, oracle=oracle, doc=doc or fn.__doc__ or "")
        return fn

    return deco
