"""Driver contract for the spark-graft builder (PySpark target).

entry(spark): flagship — Monte-Carlo pagerank over the follow graph
derived from the sf0.001 events table (the engine's core read path:
walk generation -> visit-count aggregation -> rank).

queries()/oracle_sql(): every SQL-expressible operator from
SURVEY.md §2 plus the training-data pipeline ops, implemented in
crawler_spark.contract with exact DuckDB oracles; the walk/pagerank
operators (not SQL-expressible) are rows-only entries gated by the
analytic-fixture pytest suites instead.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawler_spark import contract


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    sf_dir = "/root/testdata/sf0.001"
    scores = contract.q_mc_pagerank(spark, sf_dir)
    return (
        scores.orderBy(F.desc("rank"), F.asc("node_id"))
        .limit(20)
        .select("node_id", "rank")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(contract.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(contract.ORACLES)
