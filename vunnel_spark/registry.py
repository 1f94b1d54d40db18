"""Declared-query registry.

Every operator in SURVEY.md §2 that this engine implements registers a
``QuerySpec`` here: a Spark builder (``(spark, sf_dir) -> DataFrame``) and,
when the semantics are ANSI-SQL-expressible, the equivalent DuckDB oracle
SQL.  The driver's correctness gate runs both at sf0.01 and compares
row-count + schema + order-insensitive value hash; ``tests/`` runs the same
comparison locally at sf0.001.

Conventions (required for the hash compare to work):
- alias every computed column identically in the Spark code and the SQL;
- cast integer SUMs explicitly (duckdb sum(BIGINT) -> HUGEINT otherwise);
- round double aggregates (float summation order differs between engines);
- give every ORDER BY / top-k a total ordering (unique tie-break column).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None for non-SQL-expressible ops
    doc: str = ""
    tags: tuple = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = "", tags: tuple = ()):
    """Decorator: add a (spark_fn, oracle_sql) pair to the registry."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc, tags=tags)
        return fn

    return deco


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _ensure_loaded()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}


def select_by_tags(required_tags: list[str] | None) -> list[str]:
    """Tag algebra over the registry (SURVEY U7).

    Mirrors the reference's provider selection
    (src/vunnel/providers/__init__.py:150-183): a ``!``-prefixed tag
    excludes; a query is selected when it has ALL non-negated tags and
    NONE of the negated ones.  Empty/None criteria select everything.

    Raises ValueError for an empty tag or a bare ``!``.
    """
    _ensure_loaded()
    if not required_tags:
        return sorted(REGISTRY)
    include, exclude = set(), set()
    for tag in required_tags:
        if not tag:
            raise ValueError("invalid empty tag")
        if tag.startswith("!"):
            if not tag[1:]:
                raise ValueError(
                    "invalid tag: '!' requires a tag name (e.g., '!slow')"
                )
            exclude.add(tag[1:])
        else:
            include.add(tag)
    out = []
    for name, spec in REGISTRY.items():
        tags = set(spec.tags)
        if include and not include.issubset(tags):
            continue
        if exclude and exclude.intersection(tags):
            continue
        out.append(name)
    return sorted(out)


_loaded = False


def _ensure_loaded():
    """Import every query module exactly once (imports populate REGISTRY)."""
    global _loaded
    if _loaded:
        return
    from vunnel_spark import queries  # noqa: F401  (side-effect imports)

    _loaded = True
