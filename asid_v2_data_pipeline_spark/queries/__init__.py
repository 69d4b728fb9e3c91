"""Declared query registry — the driver contract surface.

Each entry: name -> (spark_fn(spark, sf_dir) -> DataFrame, oracle_sql | None).
Oracle SQL is ANSI SQL DuckDB runs over the same parquet tables; column
names/aliases match the Spark output exactly (the driver sorts columns by
name before hashing).  Portability rules used throughout:

- doubles rounded (ROUND(x, 4..6)) on BOTH sides — parallel summation
  order differs between engines;
- integer division spelled ``floor()`` (Spark) / ``//`` (DuckDB) — DuckDB's
  ``::INT`` cast *rounds*, Spark's truncates;
- DuckDB ``sum(int)`` returns HUGEINT -> cast BIGINT to match Spark's long;
- timestamps compared as formatted strings.
"""

from __future__ import annotations

from . import (
    _shared,
    analysis,
    audio,
    containers,
    curation,
    dedup_sim,
    encoders,
    formats,
    graph,
    grid,
    media,
    relational,
    temporal,
    webshards,
)

_MODULES = (
    relational,
    grid,
    encoders,
    _shared,
    dedup_sim,
    curation,
    media,
    graph,
    audio,
    analysis,
    containers,
    webshards,
    formats,
    temporal,
)


def all_queries() -> dict:
    """name -> callable(spark, sf_dir) -> DataFrame"""
    out = {}
    for m in _MODULES:
        out.update({k: v[0] for k, v in m.REGISTRY.items()})
    return out


def all_oracles() -> dict:
    """name -> DuckDB SQL (only for oracle-expressible queries)"""
    out = {}
    for m in _MODULES:
        out.update({k: v[1] for k, v in m.REGISTRY.items() if v[1] is not None})
    return out
