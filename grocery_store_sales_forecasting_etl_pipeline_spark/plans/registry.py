"""Query registry backing the driver contract (``__spark_entry__.py``).

Each entry pairs a PySpark builder with an optional DuckDB oracle SQL
string. The driver executes both at sf=0.01 and compares row count, schema,
and an order-insensitive value hash — so builders must alias every computed
column identically on both sides and keep results deterministic
(no ``first()`` without functional dependence, explicit tie-breaks in
top-k, floats rounded at the output boundary).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass
class RegisteredQuery:
    name: str
    build: Builder
    oracle: str | None  # DuckDB SQL; None => driver runs rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, RegisteredQuery] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: add a builder to the registry."""

    def deco(fn: Builder) -> Builder:
        REGISTRY[name] = RegisteredQuery(
            name=name, build=fn, oracle=oracle, tags=tags, doc=(fn.__doc__ or "").strip()
        )
        return fn

    return deco


def queries_map() -> dict[str, Builder]:
    return {name: q.build for name, q in REGISTRY.items()}


def oracle_sql_map() -> dict[str, str]:
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
