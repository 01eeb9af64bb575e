"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Headline set: one query per operator family, weighted toward the
shuffle-heavy shapes that dominate at 100 TB (fact-fact join+agg, windows,
signature dedup, similarity scan).

Each query runs REPS times warm (first rep discarded as warm-up for that
query's codegen/classload) and reports the MEDIAN; per-query IQR and the
rep count ride along in "spread"/"reps" so round-over-round deltas can be
judged against measured noise instead of single-shot luck. "value" is the
sum of per-query medians. Set SPARK_GRAFT_BENCH_REPS to override (min 1;
1 reproduces the old single-shot behavior).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import statistics
import sys
import tempfile
import time

HEADLINE = (
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q9_product_profit",
    "q18_large_quantity_orders",
    "join_left_outer_customer_orders",
    "skewjoin_revenue_by_priority",
    "interval_join_clicks_after_purchase",
    "win_top3_orders_per_customer",
    "win_running_sum_customer_spend",
    "window_tumbling_hourly",
    "window_session_30m",
    "asof_join_purchase_to_click",
    "dedup_exact_keep_first",
    "minhash_signatures",
    "simhash_signatures",
    "similarity_bruteforce_top10",
    "text_stats",
    "doc_fingerprints",
    # r6 additions: the multi-shuffle curation pipeline (explode ->
    # count -> anti-join -> reassemble), the grid-densify+window
    # time-series shape, and the iterative-join family (5 PageRank
    # rounds incl. the pinned edge build) — new families need trend
    # lines.
    "line_dedup_boilerplate",
    "gapfill_hourly_interpolate",
    "pagerank_trade_network",
    # [REF] normalization core: nested corpus -> normalize() spec ->
    # FK join-back -> exact-decimal rollup (plans/normcore.py).
    "normalize_star_rebuild",
    # r8 additions: tokenizer training (distributed word count + dict
    # merge loop) and the mergeable histogram-quantile sketch — new
    # families need trend lines. PQ is deliberately NOT here: its cost
    # at bench scale is ~3s of fixed Catalyst-compile overhead on a
    # constant-size expression tree (amortized at real scale), which
    # would swamp the trend signal.
    "bpe_merge_learning",
    "histogram_quantile_prices",
    # r10 addition: the explicit bloom join filter — build + probe +
    # exact join; its trend line tracks the bitmap build overhead vs
    # the probe's shuffle cut (SCALE.md round-10 measurement).
    "bloom_semi_join_orders_customers",
    # r13 additions (r12 VERDICT item 2): the four queries rewritten in
    # r12 onto operators/ranks.py's bucketed global rank pay a known
    # ~0.8 s constant DAG overhead vs their old single-task-sort form
    # (SCALE.md r12 note) — that cost must be visible to
    # round-over-round tracking, not only in the one-off SCALE.md
    # measurement.
    "rfm_customer_scores",
    "gini_revenue_concentration",
    "abc_pareto_classification",
    "ks_two_sample_click_vs_purchase",
)

# Fixed-work, single-thread, Spark-free CPU calibration probe (r12
# VERDICT item 1): this host is a shared box whose effective per-core
# speed is bimodal at the PROCESS level (SCALE.md r12 bench note:
# ±12-18% run-to-run on identical work, shuffle bytes byte-identical) —
# so every BENCH artifact embeds the probe, measured immediately before
# and after the suite, making the "host drift vs engine drift" call
# mechanical instead of forensic. Interpretation: wall-clock deltas
# round-over-round are only engine signal when the probe is level with
# the other round's probe; a uniformly-inflated suite WITH a
# proportionally-inflated probe is host placement, not a regression.
_PROBE_ITERS = 2_000_000
# Quiet-host reference, measured r13 (best-of-3 min, load < 0.1):
# normalize cross-round wall clocks by (probe / _PROBE_REF_SEC).
_PROBE_REF_SEC = 0.80


def cpu_probe_seconds(iters: int = _PROBE_ITERS) -> float:
    """Seconds for `iters` chained sha256 digests — best of 3 (min is
    the right estimator for fixed work: noise only ever adds time)."""
    import hashlib

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        h = b"\x00" * 64
        for _ in range(iters):
            h = hashlib.sha256(h).digest()
        best = min(best, time.perf_counter() - t0)
    return best


def cpu_probe_parallel_seconds(n_procs: int = 32) -> float | None:
    """Median per-process seconds for the SAME fixed work run in
    ``n_procs`` concurrent subprocesses — the multi-core twin of
    :func:`cpu_probe_seconds` (r15). A hypervisor-throttled placement
    steals proportionally to ACTIVE vCPUs, so a single-thread probe
    under-corrects 32-thread Spark stages (measured r15: single probe
    1.24x ref while 32-way concurrent ran a further 1.24x slower —
    net 1.54x, matching the otherwise-unexplained uniform suite
    inflation). Embedding both makes the multi-core host factor a
    datum in every artifact.

    Defensive parse (r15 ADVICE): a failed/empty child must not crash
    the run AFTER the whole suite has been timed — skip bad children
    and return None (recorded as null) only if a majority failed."""
    import statistics
    import subprocess

    code = (
        "import sys; sys.path.insert(0, %r); "
        "from bench import cpu_probe_seconds; print(cpu_probe_seconds())"
    ) % os.path.dirname(os.path.abspath(__file__))
    procs = [
        subprocess.Popen([sys.executable, "-c", code], stdout=subprocess.PIPE)
        for _ in range(n_procs)
    ]
    samples = []
    for p in procs:
        out, _ = p.communicate()
        if p.returncode != 0:
            continue
        try:
            samples.append(float(out))
        except ValueError:
            continue
    if len(samples) < n_procs // 2:
        print(
            f"[bench] parallel probe degraded: {len(samples)}/{n_procs} "
            "children returned a sample — recording null",
            file=sys.stderr,
        )
        return None
    return statistics.median(samples)


def _proc_stat_ticks() -> tuple[int, int] | None:
    """(steal_ticks, total_ticks) from the aggregate /proc/stat cpu
    line; None off-Linux. Steal is field 8 of the cpu summary row."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
    except OSError:
        return None
    if parts[:1] != ["cpu"] or len(parts) < 9:
        return None
    vals = [int(v) for v in parts[1:]]
    return vals[7], sum(vals)


def steal_pct_since(before: tuple[int, int] | None) -> float | None:
    """Percentage of CPU ticks the hypervisor stole since ``before``
    (r15 VERDICT item 6: the ~23% idle-steal measurement lived in
    VERIFY prose — now every bench artifact carries its own)."""
    after = _proc_stat_ticks()
    if before is None or after is None:
        return None
    dsteal = after[0] - before[0]
    dtotal = after[1] - before[1]
    if dtotal <= 0:
        return None
    return round(100.0 * dsteal / dtotal, 2)


def _read_dir_seconds(path: str) -> float:
    """Wall seconds to list + fully read every file under ``path`` —
    the page-cache/IO-state probe for the streaming leg (r15 VERDICT
    item 5: the judge's 10x run measured 5.4 s vs the builder's 0.9 s
    on the same layout; per-rep source-read timings make 'cold corpus
    files' vs 'engine regression' a datum in the artifact, not a
    forensic argument)."""
    t0 = time.perf_counter()
    for root, _dirs, files in os.walk(path):
        for fn in files:
            try:
                with open(os.path.join(root, fn), "rb") as f:
                    while f.read(1 << 20):
                        pass
            except OSError:
                pass
    return time.perf_counter() - t0


def bench_streaming_ingest(
    spark, sf_dir: str, reps: int
) -> tuple[list[float], int, list[float]]:
    """Time the [REF] production shape end-to-end: availableNow file
    stream -> normalize() fan-out -> parquet tables, exactly-once.

    Setup (untimed): build the nested order-document corpus from the
    driver parquet (a deterministic 1-in-8 keyspace slice so the stream
    leg stays a bounded fraction of suite time) and write it as JSON.
    Each rep drains the whole source with a FRESH checkpoint, so every
    rep measures the same full ingest, not an incremental no-op.
    """
    from pyspark.sql import functions as F

    from etl_sample_spark import catalog
    from etl_sample_spark.plans.normcore import ORDER_DOC_SPECS, orders_as_documents
    from etl_sample_spark.streaming.ingest import run_ingest_available_now

    root = tempfile.mkdtemp(prefix="sparkgraft_bench_stream_")
    src = os.path.join(root, "src")
    # recentProgress is a ring buffer capped at numRecentProgressUpdates
    # (default 100): a drain with >100 micro-batches would silently drop
    # the oldest entries and undercount Σ triggerExecution (r8 ADVICE).
    # Raise the cap far above any plausible batch count and ASSERT the
    # drain stayed below it so a future shape change fails loudly.
    progress_cap = 10_000
    spark.conf.set(
        "spark.sql.streaming.numRecentProgressUpdates", str(progress_cap)
    )
    try:
        orders = catalog.table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 8 == 0)
        lineitem = catalog.table(spark, sf_dir, "lineitem")
        docs = orders_as_documents(orders, lineitem)
        schema = docs.schema
        docs.coalesce(8).write.mode("overwrite").json(src)

        samples: list[float] = []
        src_read: list[float] = []
        n = -1
        # reps+1: first drain is an untimed warm-up (source listing,
        # checkpoint-dir creation, stream codegen). Sample = Σ per-batch
        # triggerExecution from StreamingQueryProgress, NOT wall-clock —
        # wall-clock was noise-dominated by checkpoint filesystem churn
        # (r7 IQR ≈ median); progress durations measure the compute the
        # trend line should track.
        for rep in range(reps + 1):
            # IO-state probe BEFORE each drain: how long a plain read of
            # the just-written JSON corpus takes right now. A cold page
            # cache here explains an inflated drain; a warm one rules
            # the IO story out.
            src_read.append(round(_read_dir_seconds(src), 3))
            out = os.path.join(root, f"out{rep}")
            ckpt = os.path.join(root, f"ckpt{rep}")
            stream = spark.readStream.schema(schema).json(src)
            q = run_ingest_available_now(stream, ORDER_DOC_SPECS, out, ckpt)
            assert q.awaitTermination(600), "streaming bench did not finish"
            def _dur(p):  # dict (classic) or StreamingQueryProgress (connect)
                d = p["durationMs"] if isinstance(p, dict) else p.durationMs
                return d.get("triggerExecution", 0)

            progress = q.recentProgress
            assert len(progress) < progress_cap, (
                f"streaming drain hit the recentProgress ring cap "
                f"({len(progress)} >= {progress_cap}): timings would "
                "silently undercount — raise the cap"
            )
            trig_ms = sum(_dur(p) for p in progress)
            if rep > 0:
                samples.append(round(trig_ms / 1000.0, 3))
            n = spark.read.parquet(os.path.join(out, "order_lines")).count()
        return samples, n, src_read
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from etl_sample_spark import get_spark
    from etl_sample_spark.plans import REGISTRY

    probe_before = round(cpu_probe_seconds(), 3)
    stat_before = _proc_stat_ticks()

    spark = get_spark("etl-sample-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM + parquet footers once so the per-query timings measure
    # execution, not first-touch JIT/classloading.
    REGISTRY["q3_shipping_priority"].spark(spark, sf_dir).collect()

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5")))

    from etl_sample_spark.plans.inspect import shuffle_bytes_written

    timings: dict[str, float] = {}
    spread: dict[str, float] = {}
    shuffle_bytes: dict[str, int] = {}
    total = 0.0
    # reps>1: one untimed per-query warm-up first (codegen compiles and
    # broadcast builds for THIS plan, not just the suite-global warm).
    # reps==1 skips it so the single timed run really is the old
    # single-shot behavior the docstring promises.
    warmups = 1 if reps > 1 else 0
    for name in HEADLINE:
        spec = REGISTRY[name]
        samples: list[float] = []
        n = -1
        for rep in range(reps + warmups):
            t0 = time.perf_counter()
            n = spec.spark(spark, sf_dir).count()
            dt = time.perf_counter() - t0
            if rep >= warmups:
                samples.append(dt)
        # One untimed metrics pass: per-query shuffle bytes written, so a
        # plan regression (a new Exchange) is visible in BENCH_rN even
        # when wall time hides inside IQR at this sf. Separate run
        # because count()'s QueryExecution doesn't feed the df's metrics.
        shuffle_bytes[name] = int(shuffle_bytes_written(spec.spark(spark, sf_dir)))
        med = statistics.median(samples)
        if len(samples) >= 4:
            q = statistics.quantiles(samples, n=4)
            iqr = q[2] - q[0]
        else:
            iqr = max(samples) - min(samples)
        timings[name] = round(med, 3)
        spread[name] = round(iqr, 3)
        total += med
        print(
            f"  {name}: median {med:.2f}s IQR {iqr:.2f}s over {len(samples)} reps "
            f"({n} rows, {shuffle_bytes[name]} shuffle bytes)",
            file=sys.stderr,
        )

    # Streaming leg: the reference-equivalent ingest path gets the same
    # median+IQR treatment (no shuffle-bytes entry — foreachBatch runs
    # its own per-batch QueryExecutions).
    stream_samples, stream_rows, stream_src_read = bench_streaming_ingest(
        spark, sf_dir, reps
    )
    med = statistics.median(stream_samples)
    if len(stream_samples) >= 4:
        q = statistics.quantiles(stream_samples, n=4)
        iqr = q[2] - q[0]
    else:
        iqr = max(stream_samples) - min(stream_samples)
    timings["streaming_ingest_available_now"] = round(med, 3)
    spread["streaming_ingest_available_now"] = round(iqr, 3)
    total += med
    print(
        f"  streaming_ingest_available_now: median {med:.2f}s IQR {iqr:.2f}s "
        f"over {len(stream_samples)} reps ({stream_rows} rows)",
        file=sys.stderr,
    )

    probe_after = round(cpu_probe_seconds(), 3)
    steal_pct = steal_pct_since(stat_before)
    probe = min(probe_before, probe_after)
    probe_parallel = cpu_probe_parallel_seconds()
    probe_parallel = round(probe_parallel, 3) if probe_parallel is not None else None
    par_txt = (
        f"{probe_parallel:.3f}s (multi-core factor "
        f"{probe_parallel / _PROBE_REF_SEC:.2f}x)"
        if probe_parallel is not None
        else "null (probe degraded)"
    )
    print(
        f"  cpu_probe: before {probe_before:.3f}s after {probe_after:.3f}s "
        f"(ref {_PROBE_REF_SEC}s -> host factor {probe / _PROBE_REF_SEC:.2f}x); "
        f"32-way parallel {par_txt}; "
        f"steal over suite {steal_pct}%",
        file=sys.stderr,
    )
    # r17 (r16 VERDICT item 5 / next-round item 2): the stdout contract
    # line is COMPACT — total + per-query medians + the host-calibration
    # scalars, ~1.7k chars. The previous single line also embedded
    # per-query spreads, shuffle bytes and streaming detail, grew past
    # the driver's captured-output tail, and was truncated mid-JSON in
    # r15 (BENCH_r15.json parsed: null), costing that round its entire
    # round-over-round comparison. The full detail still exists — it
    # moves into the BENCH_full artifact file written below; the timed
    # regions and every reported number are unchanged.
    compact = {
        "metric": "headline_suite_seconds",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "reps": reps,
        "sf": sf,
        # host-speed calibration (r12 VERDICT item 1): fixed-work
        # single-thread sha256 probe, best-of-3, measured immediately
        # before/after the suite; normalize cross-round wall clocks
        # by (min(before, after) / cpu_probe_ref_sec).
        "cpu_probe_sec": {"before": probe_before, "after": probe_after},
        "steal_pct": steal_pct,
        "value_probe_normalized": round(total * _PROBE_REF_SEC / probe, 3),
    }
    line = json.dumps(
        {
            **compact,
            "spread": spread,
            "shuffle_bytes": shuffle_bytes,
            # r15: the multi-core twin — median per-process time of the
            # same fixed work in 32 concurrent subprocesses, run once
            # after the suite. Steal scales with active vCPUs, so THIS
            # is the factor that applies to 32-thread Spark stages.
            "cpu_probe_parallel_sec": probe_parallel,
            # r16 (r15 VERDICT item 5): the streaming leg's per-rep
            # trigger sums + the per-rep source-corpus read probe (cold
            # page cache ⇒ seconds, warm ⇒ ms) so a 10x-run outlier is
            # attributable to IO state from the artifact alone.
            "streaming_detail": {
                "samples": stream_samples,
                "src_read_sec": stream_src_read,
            },
            "cpu_probe_iters": _PROBE_ITERS,
            "cpu_probe_ref_sec": _PROBE_REF_SEC,
        }
    )
    # The driver's BENCH_rN.json keeps only a 2,000-char output tail, which
    # truncates the early-query medians out of the historical record (r7
    # VERDICT item 6). Persist the FULL detail in-repo, named for the round
    # the driver is about to record (= 1 + latest BENCH_rN present). The
    # artifact is written BEFORE the stdout contract line so the compact
    # JSON is the LAST line of output, whatever the artifact path prints.
    here = os.path.dirname(os.path.abspath(__file__))
    if sf == 0.1:
        rounds = [
            int(m.group(1))
            for f in os.listdir(here)
            if (m := re.match(r"BENCH_r(\d+)\.json$", f))
        ]
        stem = f"BENCH_full_r{max(rounds, default=0) + 1:02d}"
        # Loaded-host guard (r13: an ad-hoc run under a 32-core pytest suite
        # overwrote the round's quiet-host record and a bulk git add
        # committed it). If the pre-suite probe says the host is >15% off
        # the quiet reference, the canonical record is left alone and the
        # run lands beside it as .contended.json — still persisted, never
        # authoritative. The stdout line (the driver contract) is unchanged.
        if probe > 1.15 * _PROBE_REF_SEC and os.path.exists(
            os.path.join(here, stem + ".json")
        ):
            print(
                f"[bench] host probe {probe:.3f}s > 1.15x ref {_PROBE_REF_SEC}s: "
                f"keeping existing {stem}.json, writing {stem}.contended.json",
                file=sys.stderr,
            )
            stem += ".contended"
        full = os.path.join(here, stem + ".json")
        try:
            with open(full, "w") as f:
                f.write(line + "\n")
        except OSError:
            pass  # read-only checkout: the stdout line is still the contract
    # else: off-SF runs (e.g. the 10x sfsynth sweep) must not clobber the
    # round's canonical sf0.1 record — the operator saves those manually
    # (BENCH_sf1_rNN.json).
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
