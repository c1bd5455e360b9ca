"""Query registry: the single source of truth for the driver contract.

Each operator from SURVEY.md §2 registers itself here as a named query
``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) the
equivalent ANSI SQL that DuckDB runs as the correctness oracle.

The driver contract (``__spark_entry__.py``) simply re-exports
``queries()`` / ``oracle_sql()`` from this module.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None  # DuckDB SQL; None => rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags)
        return fn

    return deco


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    # Imports are function-local so the registry module itself has no
    # circular-import hazard; each module's import side effect is the
    # register() calls at module top level.
    from am_kinesis_pay_spark.operators import (  # noqa: F401
        aggregations,
        filters,
        integration,
        joins,
        linkage,
        maintenance,
        setops,
        sorts,
        windows,
    )
    from am_kinesis_pay_spark.functions import scalars, signing, udtf_ops  # noqa: F401
    from am_kinesis_pay_spark.sources import (  # noqa: F401
        delta_protocol,
        pyds_writer,
        readers,
        sinks,
    )
    from am_kinesis_pay_spark.streaming import batch_equiv  # noqa: F401
    from am_kinesis_pay_spark.llm import (  # noqa: F401
        codecs,
        curation,
        dedup,
        multimodal,
        similarity,
        text,
    )


def queries() -> dict[str, QueryFn]:
    _load_all()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }
