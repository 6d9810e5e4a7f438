"""Registry of named queries + their DuckDB oracle SQL.

Each entry is one operator/pipeline from SURVEY.md §2's inventory (or an
LLM-pipeline extension), expressed as:

- ``fn(spark, sf_dir) -> DataFrame``: the Spark-first implementation,
- ``oracle``: equivalent SQL DuckDB runs over the same parquet (views
  ``region nation customer supplier part orders lineitem events documents
  embeddings`` are pre-registered by the driver), or ``None`` for genuinely
  non-SQL-expressible operators (driver then records a rows-only check).

Determinism contract (so the order-insensitive value-hash matches):
- aggregated money/measures: DECIMAL end-to-end, final cast DECIMAL(38,6)
  on BOTH engines (double sums are order-dependent -> never hash-stable);
- counts: BIGINT both sides (DuckDB SUM(int)->HUGEINT is always cast back);
- event-time buckets: TIMESTAMP_NTZ from ``F.window``; oracle reproduces the
  bucket with tz-independent epoch arithmetic;
- every computed column aliased identically in Spark and SQL.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from ..session import apply_runtime_confs


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator registering a query; normalizes the session's runtime confs
    before building the plan (the driver passes its own SparkSession)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            apply_runtime_confs(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        REGISTRY[name] = QuerySpec(
            name=name, fn=wrapped, oracle=oracle, doc=fn.__doc__ or "", tags=tags
        )
        return wrapped

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from . import load_all

    load_all()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracles() -> dict[str, str]:
    from . import load_all

    load_all()
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }
