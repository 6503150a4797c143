"""Query registry: name -> (spark, sf_dir) -> DataFrame, + oracle SQL.

Grouped by SURVEY.md §2 operator family. Every Spark query aliases
its computed columns identically to its oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


# Query modules self-register on import (order fixes registry order).
from skysafe_datalake_spark.workload import domain  # noqa: E402,F401
from skysafe_datalake_spark.workload import relational  # noqa: E402,F401
from skysafe_datalake_spark.workload import llm_ops  # noqa: E402,F401
from skysafe_datalake_spark.workload import temporal  # noqa: E402,F401
from skysafe_datalake_spark.workload import advanced  # noqa: E402,F401
from skysafe_datalake_spark.workload import analytics  # noqa: E402,F401
from skysafe_datalake_spark.workload import curation  # noqa: E402,F401
