"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG-extraction query on sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md §2 plus
the training-data-pipeline operators; ``oracle_sql()`` gives the DuckDB
equivalent for each SQL-expressible one (KG-extract queries embed the
frozen scorer in a mapInPandas stage and are rows-only — their
correctness gate is tests/test_parity.py against the plain-Python
reference executor).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from jerex_spark.operators import all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from jerex_spark.pipeline import flagship_triples
    return flagship_triples(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in all_queries().items()
            if sql is not None}
