"""Plan inspection utilities: mechanical answers to "how many shuffles
does this query do?" — used by tests to pin shuffle budgets so a
refactor that adds an accidental Exchange fails loudly."""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """Final (post-AQE) physical plan; triggers execution."""
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchanges in the executed plan (broadcast
    exchanges excluded — broadcasts are the cheap kind)."""
    plan = executed_plan(df)
    final = plan.split("== Initial Plan ==")[0]
    return len(re.findall(r"(?<!Broadcast)Exchange ", final))


def count_broadcasts(df: DataFrame) -> int:
    plan = executed_plan(df)
    final = plan.split("== Initial Plan ==")[0]
    return len(re.findall(r"BroadcastExchange", final))
