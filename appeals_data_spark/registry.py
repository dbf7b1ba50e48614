"""Declarative query registry.

Every implemented operator/query from SURVEY.md §2 registers itself here
with (a) a Spark DataFrame builder and (b) an ANSI-SQL oracle string the
DuckDB differential harness can run on the same tables. The driver's
``__spark_entry__.queries()`` / ``oracle_sql()`` are thin projections of
this registry; so are the pytest differential tests and bench.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    builder: Builder
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline suite
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame``."""

    def deco(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(
            name=name,
            builder=fn,
            oracle=oracle,
            tags=tags,
            bench=bench,
            doc=(fn.__doc__ or "").strip(),
        )
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    # Import for side effects: populates REGISTRY.
    from . import queries  # noqa: F401

    return REGISTRY
