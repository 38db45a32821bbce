"""Session-scoped cache registry.

Operators that persist intermediate DataFrames (dedup signatures,
canonicalization vocabularies) register them here so long-lived driver
sessions (notebooks, services, the bench loop) can release the cached
blocks once a query's final action has run, instead of leaking them
until session shutdown.  bench.py and the test session fixture call
``release_persisted()`` between queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_PERSISTED: list[DataFrame] = []


def persist_tracked(df: DataFrame) -> DataFrame:
    _PERSISTED.append(df)
    return df.persist()


def release_persisted() -> None:
    while _PERSISTED:
        _PERSISTED.pop().unpersist()
