"""State Data Source reader: offline inspection of a streaming query's
checkpointed state (Spark 4 `statestore` / `state-metadata` formats).

The reference has no streaming state at all; [EXT] this is the ops
surface every long-running 100 TB streaming job needs: answer "what is
this job holding in state, and is it bounded?" WITHOUT stopping the
query — the state store is read as a plain DataFrame from the
checkpoint location, so the bounded-state claims made throughout
``streaming/windows.py`` stop being docstring assertions and become
queryable facts (and testable ones: see
``tests/test_streaming.py::test_state_reader_*``).

Scale note: the read is partitioned like the state store itself (one
input split per store partition), so inspecting a multi-TB RocksDB
state is itself a distributed scan, and predicate/column pruning apply
to the flattened view like any DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def state_metadata(spark: SparkSession, checkpoint: str) -> DataFrame:
    """Operator-level metadata for every stateful operator in the
    checkpoint: operator name, state store name, partition counts, and
    the min/max batch ids still readable."""
    return spark.read.format("state-metadata").load(checkpoint)


def read_state(
    spark: SparkSession,
    checkpoint: str,
    *,
    state_var: str | None = None,
    flatten: bool = True,
) -> DataFrame:
    """The state rows of a checkpointed stateful operator as a DataFrame.

    ``state_var``: for transformWithState operators, the named state
    variable to read (ValueState/ListState/MapState name); omit for
    single-store operators (applyInPandasWithState, dedup, windows).
    ``flatten``: lift the nested ``key``/``value`` structs to top-level
    columns (``key_<field>``, ``value_<field>``) for direct querying.
    """
    from pyspark.sql.types import StructType

    reader = spark.read.format("statestore")
    if state_var is not None:
        reader = reader.option("stateVarName", state_var)
    df = reader.load(checkpoint)
    if not flatten:
        return df
    # The source's columns differ by state kind: ValueState/single-store
    # operators expose `key`/`value` structs, ListState exposes
    # `list_element`, MapState `user_map_key`/`user_map_value` — flatten
    # whatever struct columns are present instead of assuming `value`.
    cols: list = []
    for f in df.schema.fields:
        if isinstance(f.dataType, StructType):
            for sub in f.dataType.fieldNames():
                cols.append(F.col(f"{f.name}.{sub}").alias(f"{f.name}_{sub}"))
        else:
            cols.append(F.col(f.name))
    return df.select(*cols)


def state_key_count(spark: SparkSession, checkpoint: str, **kwargs) -> int:
    """Number of KEYS currently held in state — THE bounded-state gauge.

    Counts distinct grouping keys, not state rows: for ListState /
    MapState variables the source emits one row per element/entry
    (``flattenCollectionTypes``), so a raw count would read a 3-key ×
    20-element frame as 60. For a watermark/timer/TTL-disciplined
    operator this tracks the number of ACTIVE keys (open sessions,
    in-flight windows), not the stream's lifetime key cardinality; a
    monotonically growing value on an idle stream is the signature of a
    state leak.
    """
    df = read_state(spark, checkpoint, flatten=False, **kwargs)
    return df.select("key").distinct().count()


def progress_summary(query) -> dict:
    """Operational summary of a streaming query's RUN so far — the
    numbers an ingest dashboard alarms on, extracted from the
    StreamingQueryProgress entries the driver already collects (zero
    added instrumentation): total rows read across recent batches,
    the last non-empty batch's processing rate and wall time, and the
    most recent state rows/bytes (the bounded-state gauge as a live
    metric, complementing :func:`state_key_count`'s at-rest checkpoint
    read). Summarizing over ``recentProgress`` matters: under
    Trigger.AvailableNow the LAST progress entry is the empty
    commit batch, so ``lastProgress`` alone under-reports every run.

    Returns zeros (not None) before any progress exists, so monitors
    can alarm on `state_bytes == 0 for N minutes` without
    NULL-handling.
    """
    entries = list(query.recentProgress or [])
    if not entries:
        return {
            "batch_id": -1,
            "num_input_rows": 0,
            "input_rows_per_second": 0.0,
            "batch_duration_ms": 0,
            "state_rows": 0,
            "state_bytes": 0,
        }
    last = entries[-1]
    data_batches = [e for e in entries if int(e.get("numInputRows", 0)) > 0]
    rate_src = data_batches[-1] if data_batches else last
    state_ops = last.get("stateOperators") or []
    return {
        "batch_id": int(last.get("batchId", -1)),
        "num_input_rows": sum(int(e.get("numInputRows", 0)) for e in entries),
        "input_rows_per_second": float(rate_src.get("inputRowsPerSecond") or 0.0),
        "batch_duration_ms": int(rate_src.get("batchDuration", 0)),
        "state_rows": sum(int(s.get("numRowsTotal", 0)) for s in state_ops),
        "state_bytes": sum(int(s.get("memoryUsedBytes", 0)) for s in state_ops),
    }
