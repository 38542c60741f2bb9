"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

The registry lives in whoosh_spark/entry_queries.py; this module is a
thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: BM25F top-10 for the parsed
    query string ``"hash join" OR spark^2`` over the documents corpus."""
    from whoosh_spark.entry_queries import _docs_searcher, _topk
    from whoosh_spark.fields import documents_schema
    from whoosh_spark.query.parser import QueryParser

    s = _docs_searcher(spark, "/root/testdata/sf0.001")
    q = QueryParser("text", documents_schema()).parse('"hash join" OR spark^2')
    return _topk(s.compile(q))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from whoosh_spark.entry_queries import registry

    return {name: fn for name, (fn, _sql) in registry().items()}


def oracle_sql() -> dict[str, str]:
    """Equivalent DuckDB SQL per query (omitted => rows-only check)."""
    from whoosh_spark.entry_queries import registry

    return {name: sql for name, (_fn, sql) in registry().items() if sql is not None}
