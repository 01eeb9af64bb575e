"""Query plans: the registry of oracle-checked queries.

Importing this package registers every query module."""

from etl_sample_spark.plans.registry import REGISTRY, QuerySpec, register

# Import for side effects: each module registers its queries.
from etl_sample_spark.plans import relational  # noqa: E402,F401
from etl_sample_spark.plans import windows  # noqa: E402,F401
from etl_sample_spark.plans import scalars  # noqa: E402,F401
from etl_sample_spark.plans import setops  # noqa: E402,F401
from etl_sample_spark.plans import llm  # noqa: E402,F401
from etl_sample_spark.plans import temporal  # noqa: E402,F401
from etl_sample_spark.plans import tpch  # noqa: E402,F401
from etl_sample_spark.plans import analytics  # noqa: E402,F401
from etl_sample_spark.plans import normcore  # noqa: E402,F401
from etl_sample_spark.plans import timeseries  # noqa: E402,F401
from etl_sample_spark.plans import growth  # noqa: E402,F401
from etl_sample_spark.plans import bpe  # noqa: E402,F401

__all__ = ["REGISTRY", "QuerySpec", "register"]
