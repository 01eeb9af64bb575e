"""Event-time streaming operators (SURVEY §2.10 T2-T5): watermarked
tumbling windows, session windows, stateful dedup.

The reference has no event-time handling at all — a file arriving
mid-run is "simply picked up next run" (SURVEY §2.10). These operators
give the engine principled late-data semantics; their batch twins (same
expressions, no watermark) are oracle-checked in plans/temporal.py.

State-size note (100 TB): every operator here keys its state (window ×
group, or dedup key) and bounds it with a watermark — unbounded state is
the streaming equivalent of the unpartitioned shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def watermarked_window_counts(
    events: DataFrame,
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("event_type",),
    window: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """T2+T4: tumbling event-time window agg; rows later than the
    watermark are dropped and window state is evicted once the watermark
    passes the window end."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), *keys, "n", "total_value")
    )


def sessionized_user_activity(
    events: DataFrame,
    ts_col: str = "ts",
    key: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """T3: session windows (gap-merged) per key."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), key)
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("session_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            key,
            "n_events",
            "session_value",
        )
    )


def dedup_within_watermark(
    events: DataFrame,
    keys: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """T5: stateful exactly-once-per-key dedup with bounded state — the
    streaming fix for the reference's duplicate-on-retry appends."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(list(keys))


def dedup_within_window_batch(
    events: DataFrame,
    keys: tuple[str, ...] = ("user_id", "event_type"),
    ts_col: str = "ts",
    window: str = "1 hour",
    tie_break: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """Batch twin of :func:`dedup_within_watermark` (T5): keep the
    earliest row per key per tumbling event-time bucket.

    The bucket plays the role the watermark plays in the streaming
    version — it bounds the scope within which a key is considered "the
    same event", so state per key is bounded in both forms. Deterministic
    tie-break (``ts`` then ``tie_break``) makes the batch semantics
    oracle-checkable, unlike streaming arrival order.

    100 TB shape: one hash shuffle on (keys, bucket), then a ranked
    window — the same single-shuffle cost as any keyed dedup.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*keys, F.window(ts_col, window))
        .orderBy(F.col(ts_col).asc(), *[F.col(c).asc() for c in tie_break])
    )
    return (
        events.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def running_user_totals_stateful(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState`` (SURVEY
    §2.10/§2.11): per-user running event count + value total maintained
    as explicit GroupState across micro-batches — the shape for
    operators that watermarked windows can't express (lifetime
    accumulators, custom session logic, fraud counters).

    Arrow-batched like every pandas exchange; state is one small tuple
    per key, so at 100 TB state size is O(distinct keys), not O(rows).
    Emits one updated row per key per micro-batch.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = f"{key} BIGINT, n_events BIGINT, total_value DOUBLE"
    state_schema = "n BIGINT, total DOUBLE"

    def update(key_tuple, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {key: [key_tuple[0]], "n_events": [n], "total_value": [total]}
        )

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(key)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def finalized_sessions_stateful(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Custom session finalizer via ``applyInPandasWithState`` +
    ``EventTimeTimeout`` — emits a session row ONLY when the key has been
    quiet for ``gap_minutes`` (i.e. the session is provably closed).

    This is the semantics ``session_window`` can't express: built-in
    session windows emit merged windows but can't run arbitrary
    close-of-session logic (final payload, custom merge, side effects).
    Here the state is the open session (start/end/count/value); on each
    batch we extend it and arm an event-time timer at
    ``session_end + gap``; when the WATERMARK passes that timer Spark
    calls us back with ``state.hasTimedOut`` and we emit exactly one
    finalized row and drop the state.

    State is one 4-field tuple per ACTIVE key and is always freed by
    either extension or timeout — bounded regardless of stream length.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_ms = gap_minutes * 60 * 1000
    out_schema = (
        f"{key} BIGINT, session_start TIMESTAMP, session_end TIMESTAMP, "
        "n_events BIGINT, session_value DOUBLE"
    )
    state_schema = "start_ms BIGINT, end_ms BIGINT, n BIGINT, total DOUBLE"

    def update(key_tuple, pdfs, state: GroupState):
        if state.hasTimedOut:
            start_ms, end_ms, n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    key: [key_tuple[0]],
                    "session_start": [pd.Timestamp(start_ms, unit="ms")],
                    "session_end": [pd.Timestamp(end_ms, unit="ms")],
                    "n_events": [n],
                    "session_value": [total],
                }
            )
            return
        start_ms, end_ms, n, total = state.get if state.exists else (None, None, 0, 0.0)
        for pdf in pdfs:
            ts = pd.to_datetime(pdf[ts_col])
            lo = int(ts.min().value // 1_000_000)
            hi = int(ts.max().value // 1_000_000)
            start_ms = lo if start_ms is None else min(start_ms, lo)
            end_ms = hi if end_ms is None else max(end_ms, hi)
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((start_ms, end_ms, n, total))
        state.setTimeoutTimestamp(end_ms + gap_ms)
        return

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(key)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def stream_stream_click_attribution(
    purchases: DataFrame,
    clicks: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    attribution_window: str = "30 minutes",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join: attribute each purchase to the
    clicks the same user made within ``attribution_window`` before it —
    the streaming twin of plans/temporal.py's
    interval_join_clicks_after_purchase.

    Both sides carry watermarks and the join predicate bounds event time
    in BOTH directions, so Spark can compute how long either side's rows
    must be retained and evict join state — without the time bound the
    state would grow forever (the 100-TB streaming failure mode).

    ``how="leftOuter"`` adds the funnel-loss lane: a purchase with NO
    qualifying click is emitted exactly once, with a NULL click, as soon
    as the watermark proves no future click can still match (i.e. passes
    the purchase's event time) — the streaming form of "unattributed
    purchases", impossible to compute eagerly because absence is only
    decidable once event time has moved on.
    """
    p = purchases.withWatermark(ts_col, watermark).select(
        F.col("event_id").alias("purchase_id"),
        F.col(key).alias("p_user"),
        F.col(ts_col).alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    c = clicks.withWatermark(ts_col, watermark).select(
        F.col("event_id").alias("click_id"),
        F.col(key).alias("c_user"),
        F.col(ts_col).alias("click_ts"),
    )
    return p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") < F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {attribution_window}")),
        how,
    ).select("purchase_id", "click_id", F.col("p_user").alias(key), "purchase_ts", "click_ts")


def running_user_totals_tws(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Per-user running totals on Spark 4's ``transformWithStateInPandas``
    — the successor stateful API to ``applyInPandasWithState`` (same
    semantics as :func:`running_user_totals_stateful`, re-expressed on the
    new surface so both generations of the API are covered).

    What the new API buys at scale: named state variables (Value/List/Map
    instead of one monolithic tuple), per-state TTL (``state_ttl_ms``
    evicts idle keys without hand-rolled timers — the bounded-state knob
    for 100-TB key cardinality), and RocksDB-backed state (required
    provider) so state spills to disk instead of capping at executor heap.

    Runtime requirements: ``spark.sql.streaming.stateStore.providerClass``
    = RocksDBStateStoreProvider, and a working ``google.protobuf`` (the
    TWS Python driver worker speaks protobuf to the JVM; the test is
    env-gated on it).

    TTL caveat (r11, measured): Spark REQUIRES timeMode=ProcessingTime
    for TTL state (under "None" the JVM rejects it and the TWS driver
    worker crashes), so setting ``state_ttl_ms`` switches this operator
    to ProcessingTime mode. In at least one local-mode environment
    (PySpark 4.1.2 + vendored-protobuf worker) ANY ProcessingTime-mode
    TWS query hangs — even a minimal no-TTL one — so the TTL path is
    plan-pinned in tests rather than run e2e; without a TTL the
    operator keeps the timer-free "None" mode, which runs everywhere.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = f"{key} BIGINT, n_events BIGINT, total_value DOUBLE"

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState(
                "totals", "n BIGINT, total DOUBLE", ttlDurationMs=state_ttl_ms
            )

        def handleInputRows(self, key_tuple, rows, timer_values):
            import pandas as pd

            n, total = self._totals.get() if self._totals.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._totals.update((n, total))
            yield pd.DataFrame(
                {key: [key_tuple[0]], "n_events": [n], "total_value": [total]}
            )

        def close(self) -> None:
            pass

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(key)
        .transformWithStateInPandas(
            statefulProcessor=RunningTotals(),
            outputStructType=out_schema,
            outputMode="Update",
            # TTL state REQUIRES ProcessingTime mode (Spark raises
            # STATEFUL_PROCESSOR_INCORRECT_TIME_MODE_TO_ASSIGN_TTL under
            # "None"); without TTL the mode stays timer-free.
            timeMode="ProcessingTime" if state_ttl_ms is not None else "None",
        )
    )


def ewma_user_value_stateful(
    events: DataFrame,
    alpha: float = 0.3,
    key: str = "user_id",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming twin of the batch EWMA (plans/timeseries.py::
    ewma_final_value_by_user): the same a*x + (1-a)*acc recurrence
    carried incrementally as per-key GroupState across micro-batches —
    the unbounded-stream form the batch query's docstring promises.
    Within a batch, rows fold in (ts, event_id) order; across batches,
    state seeds the fold, so in-order delivery reproduces the batch
    fold exactly (pinned in test_streaming.py).

    State is (n, ewma) per key — O(distinct keys) at any scale.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = f"{key} BIGINT, n_events BIGINT, ewma DOUBLE"
    state_schema = "n BIGINT, ewma DOUBLE"

    def update(key_tuple, pdfs, state: GroupState):
        n, acc = state.get if state.exists else (0, 0.0)
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values([ts_col, "event_id"])
        for v in rows["value"]:
            v = float(v)
            acc = v if n == 0 else alpha * v + (1.0 - alpha) * acc
            n += 1
        state.update((n, acc))
        yield pd.DataFrame({key: [key_tuple[0]], "n_events": [n], "ewma": [acc]})

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(key)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )




def _score_rolling_frame(
    state_vals: list[int],
    batch: list[tuple[int, float]],
    frame: int = 20,
) -> tuple[list[tuple[int, float, float]], list[int]]:
    """Pure per-key core of :func:`rolling_zscore_tws`: score each
    (event_id, value) against the carried money-grid frame with the
    IDENTICAL integer fixed-point math as the batch
    ``rolling_zscore_anomalies`` window, returning (anomalies as
    (event_id, value, zscore), new trimmed state). Split out so the
    math is pytest-exercised even where the TWS runtime (protobuf)
    is unavailable."""
    import math

    vals = list(state_vals)
    out: list[tuple[int, float, float]] = []
    for event_id, value in batch:
        # half-AWAY-FROM-ZERO, matching Spark F.round / SQL ROUND —
        # Python's round() is banker's and diverges off the 2dp grid
        # (e.g. 10.005): the batch query and this core must quantize
        # identically for the exact-equivalence contract
        av = abs(value) * 100
        v = int(math.floor(av + 0.5)) * (1 if value >= 0 else -1)
        win = vals[-frame:]
        n = len(win)
        if n == frame:
            s1 = sum(win)
            s2 = sum(x * x for x in win)
            var_n = n * s2 - s1 * s1
            num = n * v - s1
            if var_n > 0 and num * num > 4 * n * var_n:
                out.append((event_id, value, num / math.sqrt(n * var_n)))
        vals.append(v)
    return out, vals[-frame:]


def rolling_zscore_tws(
    events: DataFrame,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    frame: int = 20,
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming twin of the batch ``rolling_zscore_anomalies`` query on
    ``transformWithStateInPandas``: per event_type, a ListState carries
    the last ``frame`` money-grid values ACROSS micro-batches, and each
    arriving event is scored against the frame exactly like the batch
    window (exact integer fixed-point, cross-multiplied |z|>2 — no
    float summation-order seam between the two planes).

    Ordering contract: batch equivalence is exact for EVENT-TIME-ORDERED
    arrival (rows are sorted within each micro-batch, and batches are
    assumed non-interleaved in event time). A late in-watermark event
    is scored against the frame as of its ARRIVAL — the standard
    score-on-arrival streaming trade; already-emitted scores are never
    revised. Strict event-time semantics under disorder require
    buffering to watermark expiry (timer-based eviction), which this
    operator intentionally does not do.

    Emits only the anomalies (event_id, event_type, value, zscore).
    State is bounded at ``frame`` bigints per key by construction; TTL
    evicts idle keys. Same runtime requirements AND the same TTL/
    ProcessingTime caveat as :func:`running_user_totals_tws` (RocksDB
    state store, protobuf; ``state_ttl_ms`` switches to ProcessingTime
    mode, which hangs in some local environments — plan-pinned there).
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = "event_id BIGINT, event_type STRING, value DOUBLE, zscore DOUBLE"

    class RollingZ(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._frame = handle.getListState(
                "frame", "v BIGINT", ttlDurationMs=state_ttl_ms
            )

        def handleInputRows(self, key_tuple, rows, timer_values):
            import pandas as pd

            pdfs = [pdf for pdf in rows]
            batch = pd.concat(pdfs).sort_values([ts_col, "event_id"], kind="mergesort")
            # ListState.get() yields plain tuples (not Rows) in PySpark 4.1
            vals = [int(r[0]) for r in self._frame.get()]
            anomalies, vals = _score_rolling_frame(
                vals,
                [(int(r.event_id), float(r.value)) for r in batch.itertuples(index=False)],
                frame,
            )
            self._frame.put([(x,) for x in vals])
            yield pd.DataFrame(
                {
                    "event_id": [a[0] for a in anomalies],
                    "event_type": [key_tuple[0]] * len(anomalies),
                    "value": [a[1] for a in anomalies],
                    "zscore": [a[2] for a in anomalies],
                }
            )

        def close(self) -> None:
            pass

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy("event_type")
        .transformWithStateInPandas(
            statefulProcessor=RollingZ(),
            outputStructType=out_schema,
            outputMode="Append",
            # see running_user_totals_tws: TTL forces ProcessingTime.
            timeMode="ProcessingTime" if state_ttl_ms is not None else "None",
        )
    )


def finalized_sessions_tws(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Session finalizer on ``transformWithStateInPandas`` with
    EVENT-TIME TIMERS — the transformWithState twin of
    :func:`finalized_sessions_stateful`, exercising the capability the
    old API folds into ``GroupStateTimeout``: explicit, per-key timer
    registration (``handle.registerTimer``), re-arming on extension
    (``deleteTimer`` of the stale expiry), and a SEPARATE
    ``handleExpiredTimer`` callback fired when the WATERMARK passes the
    armed timestamp.

    Semantics are identical to the applyInPandasWithState version: one
    finalized row per session, emitted only once the key has been quiet
    for ``gap_minutes`` in event time — the session is provably closed.
    State (one 4-field ValueState + one armed timer per ACTIVE key) is
    freed on expiry; at 100 TB key cardinality the state store holds
    only open sessions and RocksDB spills them to disk.

    Same runtime requirements as :func:`running_user_totals_tws`
    (RocksDB state store provider, working ``google.protobuf``).
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    gap_ms = gap_minutes * 60 * 1000
    key_col = key  # the expiry callback's own `key` param shadows the name
    out_schema = (
        f"{key} BIGINT, session_start TIMESTAMP, session_end TIMESTAMP, "
        "n_events BIGINT, session_value DOUBLE"
    )

    class SessionFinalizer(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._sess = handle.getValueState(
                "sess", "start_ms BIGINT, end_ms BIGINT, n BIGINT, total DOUBLE"
            )

        def handleInputRows(self, key_tuple, rows, timer_values):
            import pandas as pd

            start_ms, end_ms, n, total = (
                self._sess.get() if self._sess.exists() else (None, None, 0, 0.0)
            )
            stale_timer = None if end_ms is None else end_ms + gap_ms
            for pdf in rows:
                ts = pd.to_datetime(pdf[ts_col])
                lo = int(ts.min().value // 1_000_000)
                hi = int(ts.max().value // 1_000_000)
                start_ms = lo if start_ms is None else min(start_ms, lo)
                end_ms = hi if end_ms is None else max(end_ms, hi)
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._sess.update((start_ms, end_ms, n, total))
            new_timer = end_ms + gap_ms
            if stale_timer is not None and stale_timer != new_timer:
                self._handle.deleteTimer(stale_timer)
            self._handle.registerTimer(new_timer)
            return
            yield  # makes this a generator that emits nothing on input

        # signature fixed by the runtime (invoked with these keywords)
        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            import pandas as pd

            if not self._sess.exists():
                return
            start_ms, end_ms, n, total = self._sess.get()
            self._sess.clear()
            yield pd.DataFrame(
                {
                    key_col: [key[0]],
                    "session_start": [pd.Timestamp(start_ms, unit="ms")],
                    "session_end": [pd.Timestamp(end_ms, unit="ms")],
                    "n_events": [n],
                    "session_value": [total],
                }
            )

        def close(self) -> None:
            pass

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(key)
        .transformWithStateInPandas(
            statefulProcessor=SessionFinalizer(),
            outputStructType=out_schema,
            outputMode="Append",
            timeMode="EventTime",
        )
    )


def per_type_user_totals_tws(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Per-user, per-event-type running totals on MapState — the third
    transformWithState named-state kind (Value and List are covered by
    :func:`running_user_totals_tws` / :func:`rolling_zscore_tws`).

    Why MapState and not one ValueState holding a dict: the map's
    per-entry point reads/writes (``getValue``/``updateValue``) touch
    ONLY the entries present in the micro-batch — with RocksDB state a
    user with 1,000 seen event types pays for the 2 types in this batch,
    not a 1,000-entry blob (de)serialization per batch. That per-entry
    access is the 100 TB contract for wide per-key sub-keyed state.

    Emits one row per (user, event_type present in the batch) with the
    updated running (n_events, total_value). Same runtime requirements
    as :func:`running_user_totals_tws`.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    key_col = key
    out_schema = (
        f"{key} BIGINT, event_type STRING, n_events BIGINT, total_value DOUBLE"
    )

    class PerTypeTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._by_type = handle.getMapState(
                "by_type", "event_type STRING", "n BIGINT, total DOUBLE"
            )

        def handleInputRows(self, key_tuple, rows, timer_values):
            import pandas as pd

            touched: dict[str, tuple[int, float]] = {}
            for pdf in rows:
                # dropna=False: pandas groupby silently EXCLUDES null
                # keys by default, which would vanish null-event_type
                # rows from the totals — the Spark-side operators
                # (watermarked_window_counts etc.) keep a NULL group, so
                # this one does too (NaN normalized to None for the
                # state key and the emitted column).
                for etype, grp in pdf.groupby("event_type", dropna=False):
                    if etype != etype:  # NaN -> None
                        etype = None
                    n, total = touched.get(etype) or (
                        self._by_type.getValue((etype,))
                        if self._by_type.exists() and self._by_type.containsKey((etype,))
                        else (0, 0.0)
                    )
                    touched[etype] = (n + len(grp), total + float(grp["value"].sum()))
            for etype, (n, total) in touched.items():
                self._by_type.updateValue((etype,), (n, total))
            if touched:
                yield pd.DataFrame(
                    {
                        key_col: [key_tuple[0]] * len(touched),
                        "event_type": list(touched),
                        "n_events": [v[0] for v in touched.values()],
                        "total_value": [v[1] for v in touched.values()],
                    }
                )

        def close(self) -> None:
            pass

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(key)
        .transformWithStateInPandas(
            statefulProcessor=PerTypeTotals(),
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="None",
        )
    )


def enrich_with_dimension(
    stream: DataFrame,
    dim: DataFrame,
    key: str = "user_id",
    how: str = "left",
) -> DataFrame:
    """Stream-STATIC enrichment join: each micro-batch of the stream is
    joined against a bounded dimension table (user/customer attributes).

    Unlike a stream-stream join this is STATELESS — no watermark, no
    join state, nothing to evict: the static side is simply (broadcast-)
    hash-joined into every micro-batch, so the operator adds zero state
    bytes regardless of how long the query runs. At 100 TB/day this is
    the default shape for reference-data enrichment; only when the
    dimension itself must be versioned per event time does it graduate
    to a stream-stream or as-of form (plans/temporal.py).

    The explicit ``broadcast`` hint keeps the join map-side even if the
    static side's stats are unknown (common for freshly-written parquet).
    """
    return stream.join(F.broadcast(dim), key, how)
