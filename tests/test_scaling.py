"""Scale-proof tests over the synthesized sf1-class dataset (re-keyed
10× union of sf0.1 — ``etl_sample_spark/sources/synth.py``).

Gated behind ``SPARK_GRAFT_SCALE_TEST=1``: the dataset is ~100 MB /
6M-row lineitem and each timing test runs minutes, which doesn't belong
in the default suite. Run per round with:

    python -m etl_sample_spark.sources.synth /root/testdata/sf0.1 /tmp/sfsynth1 10
    SPARK_GRAFT_SCALE_TEST=1 python -m pytest tests/test_scaling.py -q

Findings land in SCALE.md; the bench artifact is BENCH_sf1.json.
"""

from __future__ import annotations

import os
import statistics
import time

import pytest
from pyspark.sql import functions as F

from etl_sample_spark import catalog
from etl_sample_spark.plans import REGISTRY

SYNTH_DIR = os.environ.get("SPARK_GRAFT_SYNTH_DIR", "/tmp/sfsynth1")

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SCALE_TEST"),
    reason="scale suite is opt-in (SPARK_GRAFT_SCALE_TEST=1)",
)


@pytest.fixture(scope="module", autouse=True)
def _ensure_synth_dataset(spark):
    """Self-provision: synthesize the 10× dataset on first use so the
    env var is the only gate (generation is ~1 min, one-off)."""
    if not os.path.exists(os.path.join(SYNTH_DIR, "lineitem.parquet")):
        from etl_sample_spark.sources.synth import synthesize_scale

        synthesize_scale(spark, "/root/testdata/sf0.1", SYNTH_DIR, factor=10)

# The five most expensive headline queries (r5 plan audit). Bound is
# wall(synth1) <= RATIO_BOUND * max(wall(sf0.1), FLOOR_S): data grows
# 10×, so a linear stage lands near 10×, an accidentally-quadratic one
# near 100×. FLOOR_S absorbs fixed overhead (planning, task launch)
# that dominates sub-second sf0.1 timings.
FLAGSHIP = (
    "skewjoin_revenue_by_priority",
    "q5_local_supplier_volume",
    "q9_product_profit",
    "q3_shipping_priority",
    "q18_large_quantity_orders",
    # r6 additions: the heaviest new shapes — multi-shuffle line dedup,
    # token-stream LM scoring, iterative PageRank (k joins), and the
    # fuzzy-closure entity-resolution composition. Each must also stay
    # ~linear at 10× or its 100 TB story is wrong.
    "line_dedup_boilerplate",
    "unigram_logprob_score",
    "pagerank_trade_network",
    "entity_resolution_part_names",
    # r7 additions: the privacy family's heaviest members — the full
    # plant-PII -> scrub -> quality-gate -> dedup chain (regex-heavy
    # map work + a digest shuffle over documents) and the structured
    # k-anonymity cell audit over customer.
    "corpus_prep_end_to_end",
    "text_scrub_pii",
    "k_anonymity_audit",
    # r8 additions: tokenizer training (word-count shuffle must stay
    # the only corpus-sized stage), the latest-wins CDC apply (one key
    # shuffle), and the histogram quantile sketch (map-side-combinable
    # 1000-bounded partials — should be the FLATTEST curve here).
    "bpe_merge_learning",
    "cdc_upsert_apply_customers",
    "histogram_quantile_prices",
    # r10 addition: the cross-snapshot dedup probe — digest semi join +
    # band-index probe; both sides grow 10×, the probe must stay linear.
    "incremental_dedup_new_vs_corpus",
    # r10 batch 7: the heaviest new analytic shape — map-only bigram
    # stream + three model-table equi-joins + per-doc agg; the model
    # tables grow sub-linearly (vocabulary), the stream linearly.
    "bigram_lm_interpolated_score",
    # r12 additions: the three ex-dimension-global-window queries, now
    # on bucketed_global_rank — the whole point of the rewrite is that
    # they scale, so they join the evidence suite.
    "rfm_customer_scores",
    "gini_revenue_concentration",
    "abc_pareto_classification",
)
RATIO_BOUND = 12.0
FLOOR_S = 0.5


def _median_wall(spark, name: str, sf_dir: str, reps: int = 3) -> float:
    spec = REGISTRY[name]
    spec.spark(spark, sf_dir).count()  # warm: codegen + broadcasts for this plan
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        spec.spark(spark, sf_dir).count()
        samples.append(time.perf_counter() - t0)
    return statistics.median(samples)


@pytest.mark.parametrize("name", FLAGSHIP)
def test_flagship_scaling_near_linear(spark, name):
    base = _median_wall(spark, name, "/root/testdata/sf0.1")
    scaled = _median_wall(spark, name, SYNTH_DIR)
    ratio = scaled / max(base, FLOOR_S)
    assert ratio <= RATIO_BOUND, (
        f"{name}: {base:.2f}s at sf0.1 -> {scaled:.2f}s at 10x "
        f"(ratio {ratio:.1f} > {RATIO_BOUND}) — super-linear stage"
    )


def _band_join_work(bands_df, key_cols: list[str]) -> tuple[int, int, int]:
    """(n_rows, Σ bucket², max bucket²) for a banded self-join — the
    candidate-pair work the equi-join will actually do."""
    sizes = bands_df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("c"))
    row = sizes.agg(
        F.sum("c").alias("n"),
        F.sum(F.col("c") * F.col("c")).alias("work"),
        F.max(F.col("c") * F.col("c")).alias("worst"),
    ).head()
    return int(row["n"]), int(row["work"]), int(row["worst"])


def test_minhash_band_buckets_stay_linear(spark):
    """MinHash LSH band buckets at 10×: join work Σ bucket² must stay a
    small multiple of n (hash keys spread; near-dup groups are small),
    and no single bucket may dominate — the skew guard for the banded
    join shape at 100 TB."""
    from etl_sample_spark.operators.dedup import minhash_signature_df

    docs = catalog.table(spark, SYNTH_DIR, "documents")
    sig = minhash_signature_df(docs)
    bands = sig.select(
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("band"), F.concat_ws(":", "h0", "h1").alias("key")),
                F.struct(F.lit(1).alias("band"), F.concat_ws(":", "h2", "h3").alias("key")),
            )
        ).alias("b")
    ).select("b.band", "b.key")
    n, work, worst = _band_join_work(bands, ["band", "key"])
    assert work <= 60 * n, f"MinHash band join work {work} > 60*n ({n}) — buckets collapsing"
    assert worst <= work * 0.25, f"one MinHash bucket is {worst/work:.0%} of all join work"


def test_incremental_probe_work_stays_linear(spark):
    """Cross-snapshot dedup at 10×: the new-batch band keys are probed
    against the corpus band index, so the join work is
    Σ (new_bucket × corpus_bucket) over COLLIDING keys only. That must
    stay a small multiple of n, with no dominating bucket — the scale
    contract that lets a crawl batch probe a 100 TB corpus index."""
    from etl_sample_spark.operators.dedup import minhash_band_frame
    from etl_sample_spark.operators.sampling import hash_position

    docs = catalog.table(spark, SYNTH_DIR, "documents")
    tagged = docs.withColumn("__new", (hash_position(F.col("doc_id")) % 5) == 0)
    new_sizes = (
        minhash_band_frame(tagged.filter(F.col("__new")))
        .groupBy("band", "key")
        .agg(F.count(F.lit(1)).alias("a"))
    )
    corp_sizes = (
        minhash_band_frame(tagged.filter(~F.col("__new")))
        .groupBy("band", "key")
        .agg(F.count(F.lit(1)).alias("b"))
    )
    colliding = new_sizes.join(corp_sizes, ["band", "key"])
    row = colliding.agg(
        F.sum(F.col("a") * F.col("b")).alias("work"),
        F.max(F.col("a") * F.col("b")).alias("worst"),
    ).head()
    n = docs.count()
    work = int(row["work"] or 0)
    worst = int(row["worst"] or 0)
    assert work <= 60 * n, f"incremental probe work {work} > 60*n ({n})"
    assert worst <= max(1, int(work * 0.25)), (
        f"one bucket is {worst}/{work} of the probe work — salting needed"
    )


def test_simhash_bucket_entropy_and_cap(spark):
    """The SimHash scale reality, measured at 50k docs (and pinned so the
    conclusion can't silently rot):

    1. 16-bit banded join work is quadratic-class (≥ n²/64) — the
       driver-demo width stops scaling around n≈10⁵.
    2. Widening to 32 bits helps but does NOT linearize: SimHash bits
       are vocabulary majority votes, so a homogeneous corpus yields
       correlated signatures and entropy-bounded buckets regardless of
       width (this is why xxhash64 tokens don't fix it either).
    3. The ``max_bucket`` cap is the effective guard: dropping
       oversized (low-information) bands collapses join work into the
       linear class, the same trade as max_df stop-shingle removal.

    MinHash remains the guaranteed-linear near-dup path on such corpora
    (test_minhash_band_buckets_stay_linear)."""
    from etl_sample_spark.operators.dedup import _striped_band_key, simhash_df

    docs = catalog.table(spark, SYNTH_DIR, "documents")
    n_bands = 4

    def banded(bits: int):
        sig = simhash_df(docs, bits=bits)
        return sig.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("band"),
                            _striped_band_key(F.col("simhash"), i, n_bands, bits).alias("key"),
                        )
                        for i in range(n_bands)
                    ]
                )
            ).alias("b")
        ).select("b.band", "b.key")

    n16, work16, _ = _band_join_work(banded(16), ["band", "key"])
    n32, work32, _ = _band_join_work(banded(32), ["band", "key"])
    n_docs = n16 // n_bands
    # (1) the 16-bit ceiling
    assert work16 >= n_docs * n_docs // 64, "16-bit work unexpectedly low — check measurement"
    # (2) widening helps but stays quadratic-class (entropy-bounded):
    # if this ever drops into the linear class, the corpus changed and
    # the SCALE.md story should be revisited.
    assert work32 < work16, "widening 16->32 bits did not reduce join work at all"
    assert work32 > 100 * n_docs, (
        f"32-bit work {work32} is linear-class — entropy conclusion in "
        "SCALE.md no longer holds, revisit"
    )
    # (3) the cap linearizes: keep only buckets <= 10 * expected uniform
    # size and the residual join work must be a small multiple of n.
    cap = 10 * max(n_docs // 256, 1)  # 256 = 8-bit striped band keyspace
    sizes = banded(32).groupBy("band", "key").agg(F.count(F.lit(1)).alias("c"))
    row = (
        sizes.where(F.col("c") <= cap)
        .agg(F.sum(F.col("c") * F.col("c")).alias("work"), F.sum("c").alias("kept"))
        .head()
    )
    capped_work, kept = int(row["work"]), int(row["kept"])
    # With bucket sizes bounded by `cap`, Σc² ≤ cap·Σc — join work is
    # LINEAR in n with the cap as the per-row constant. Pin both the
    # formula and the measured effectiveness (the cap must actually
    # bite on this corpus, not pass vacuously).
    assert capped_work <= cap * kept, "cap arithmetic violated — measurement bug"
    assert capped_work <= work32 / 10, (
        f"cap only cut join work {work32} -> {capped_work}; "
        "oversized buckets no longer dominate — revisit SCALE.md"
    )
    # the cap must not amputate the corpus: most band rows survive in
    # at least one band (pairs lose recall only if ALL their matching
    # bands are oversized)
    assert kept >= n_docs, f"cap kept only {kept} band rows for {n_docs} docs"


def test_flagship_shuffle_bytes_scale_linearly(spark):
    """Shuffle bytes written must grow ~linearly (≤ ~20×) for 10× data —
    a byte-level check that no flagship plan shuffles a fact table it
    previously pruned/broadcast (wall-clock noise can't hide this)."""
    from etl_sample_spark.plans.inspect import shuffle_bytes_written

    for name in FLAGSHIP:
        spec = REGISTRY[name]
        base = shuffle_bytes_written(spec.spark(spark, "/root/testdata/sf0.1"))
        scaled = shuffle_bytes_written(spec.spark(spark, SYNTH_DIR))
        assert scaled <= max(base, 10_000) * 20, (
            f"{name}: shuffle bytes {base} -> {scaled} at 10x data — "
            "a previously-pruned relation is being shuffled"
        )


def test_bucketed_rank_grids_stay_bounded_at_10x(spark):
    """The r12 rank rewrites' scale contract, measured not asserted:
    for each bucket choice, the occupied-bucket GRID must stay
    broadcast-sized and the max single-bucket occupancy (= worst
    per-task window input) must stay far below dimension size. Bounds
    chosen ~5× above observed 10× values — a regression to a
    dimension-global sort would blow them by orders of magnitude."""
    orders = catalog.table(spark, SYNTH_DIR, "orders")
    li = catalog.table(spark, SYNTH_DIR, "lineitem")

    cust = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("monetary"),
        F.datediff(
            F.lit("2001-09-01").cast("timestamp"), F.max("o_orderdate")
        ).alias("recency"),
    )
    n_cust = cust.count()
    parts = li.groupBy("l_partkey").agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (1 - F.col("l_discount").cast("decimal(18,4)"))
        ).alias("r")
    )

    def grid_stats(df, bucket):
        g = df.groupBy(bucket.alias("b")).count().agg(
            F.count(F.lit(1)).alias("n_buckets"), F.max("count").alias("max_occ")
        ).collect()[0]
        return g["n_buckets"], g["max_occ"]

    events = catalog.table(spark, SYNTH_DIR, "events").where(
        F.col("event_type").isin("click", "purchase")
    )
    ks_pts = events.groupBy(F.col("value").alias("v")).count().select("v")

    checks = {
        "ks-value-0.25-grid": grid_stats(ks_pts, F.floor(F.col("v") * 4)),
        "recency-day-grid": grid_stats(cust, -F.col("recency")),
        "freq-chunk-grid": grid_stats(
            cust,
            F.struct(F.col("frequency"), F.floor(F.col("o_custkey") / 2097152)),
        ),
        "monetary-4096-grid": grid_stats(
            cust, F.floor(F.col("monetary").cast("double") / 4096.0)
        ),
        "partrev-4096-grid": grid_stats(
            parts, F.floor((-F.col("r")).cast("double") / 4096.0)
        ),
    }
    for label, (n_buckets, max_occ) in checks.items():
        # grid must broadcast (≤ ~100k rows even at 100× this dataset)
        assert n_buckets <= 100_000, (label, n_buckets)
        # no bucket may approach the dimension size (single-task sort)
        assert max_occ <= max(2_097_152, n_cust // 10), (label, max_occ, n_cust)


def test_allowlisted_global_window_grids_at_10x(spark):
    """r12 VERDICT item 4: every _BOUNDED_GLOBAL_WINDOWS allowlist entry
    gets what the KS query got in r12 — its exact window-input grid
    rebuilt and MEASURED at 10×, with an explicit occupancy cap. The KS
    query sat in this allowlist for two rounds with a mislabeled
    continuous grid ("distinct jump points" of a continuous double =
    corpus-global window in disguise); a label is not a bound, a
    measured count is.

    Two boundedness classes:
    - span/vocab-SATURATED grids (calendar days/weeks, priorities,
      source×lang, fixed histogram buckets, LIMIT shortlists): the cap
      is intrinsic to the domain, so occupancy at 10× must ALSO be
      ~level with sf0.1 (ratio ≤ 2) — SF-independence observed, not
      assumed;
    - FINITE-DOMAIN grids not yet saturated (the classifier score:
      round(softsign, 6) ∈ [0,1] → ≤ 1,000,001 values EVER): occupancy
      may still grow with the corpus below saturation, so the assertion
      is the structural domain cap plus a measured range check — the
      single-task window input can never exceed ~1M ~16-byte rows at
      ANY corpus size, which is the boundedness claim the allowlist
      makes for classifier_auc_mann_whitney / classifier_decile_lift
      (r12 VERDICT named the 1e-6 score grid the largest open risk).

    The coverage assertion at the end keeps this test and the allowlist
    in lockstep: a new allowlist entry without a grid check here fails.
    """
    from test_plans import _BOUNDED_GLOBAL_WINDOWS

    from etl_sample_spark.plans.llm import _bm25_scored, _qc_score_col

    sf01 = "/root/testdata/sf0.1"

    def occ(build, sf_dir):
        return build(sf_dir).distinct().count()

    def hist_buckets(sf_dir):
        li = catalog.table(spark, sf_dir, "lineitem")
        b = li.agg(
            F.min("l_extendedprice").alias("lo"),
            F.max("l_extendedprice").alias("hi"),
        ).head()
        lo, hi = float(b["lo"]), float(b["hi"])
        width = (hi - lo) / 1000.0
        return li.select(
            F.least(
                F.floor((F.col("l_extendedprice") - F.lit(lo)) / F.lit(width)).cast(
                    "bigint"
                ),
                F.lit(999).cast("bigint"),
            ).alias("g")
        )

    def source_lang(sf_dir):
        return catalog.table(spark, sf_dir, "documents").select("source", "lang")

    def week_grid(sf_dir):
        anchor = F.lit("1995-01-02").cast("timestamp")
        return (
            catalog.table(spark, sf_dir, "orders")
            .where(F.col("o_orderdate") >= anchor)
            .select(F.floor(F.datediff(F.col("o_orderdate"), anchor) / 7).alias("g"))
        )

    def priority_grid(sf_dir):
        return catalog.table(spark, sf_dir, "orders").select("o_orderpriority")

    def day_grid(sf_dir):
        return catalog.table(spark, sf_dir, "orders").select(
            F.col("o_orderdate").cast("date").alias("g")
        )

    def convert_hours(sf_dir):
        ev = catalog.table(spark, sf_dir, "events")
        t_us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
        per_user = ev.groupBy("user_id").agg(
            F.min(F.when(F.col("event_type") == "view", t_us)).alias("t_view")
        )
        purch = ev.where(F.col("event_type") == "purchase").select(
            "user_id", t_us.alias("t_p")
        )
        return (
            per_user.where(F.col("t_view").isNotNull())
            .join(purch, "user_id")
            .where(F.col("t_p") > F.col("t_view"))
            .groupBy("user_id", "t_view")
            .agg(F.min("t_p").alias("t_conv"))
            .select(F.expr("(t_conv - t_view) div 3600000000").alias("g"))
        )

    def lifetime_grid(sf_dir):
        return (
            catalog.table(spark, sf_dir, "orders")
            .groupBy("o_custkey")
            .agg(
                F.datediff(
                    F.max(F.col("o_orderdate").cast("date")),
                    F.min(F.col("o_orderdate").cast("date")),
                ).alias("g")
            )
            .select("g")
        )

    # --- span/vocab-saturated grids: hard cap + SF-independence ratio ---
    saturated = {
        # fixed 1000-bucket histogram: least(..., 999) makes >1000 impossible
        ("histogram_quantile_prices",): (hist_buckets, 1_000),
        # crawl-source × language vocabulary
        ("source_mix_report",): (source_lang, 1_000),
        # weekly calendar over the 1995-2001 order span
        ("wow_revenue_growth",): (week_grid, 500),
        # TPC-H order priorities
        ("largest_remainder_allocation",): (priority_grid, 10),
        # daily calendar over the order span — feeds BOTH timeseries queries
        ("acf_daily_revenue", "cusum_changepoint_daily_revenue"): (day_grid, 5_000),
        # view→purchase duration in hours, bounded by the events time span
        ("time_to_convert_distribution",): (convert_hours, 2_000),
        # customer lifetime in days, bounded by the order span
        ("kaplan_meier_customer_lifetime",): (lifetime_grid, 5_000),
    }
    covered: set[str] = set()
    for names, (build, cap) in saturated.items():
        n10 = occ(build, SYNTH_DIR)
        n01 = occ(build, sf01)
        assert n10 <= cap, (names, n10, cap)
        assert n10 <= 2 * max(n01, 10), (names, n01, n10)
        covered.update(names)

    # --- LIMIT shortlist: the window input IS a top-50 TakeOrdered ---
    docs10 = catalog.table(spark, SYNTH_DIR, "documents")
    n_top = (
        _bm25_scored(docs10)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(50)
        .count()
    )
    assert n_top <= 50, n_top
    covered.add("hybrid_rrf_rerank")

    # --- finite-domain score grid (the r12-flagged 1e-6 risk) ---
    score10 = docs10.select(_qc_score_col().alias("g"))
    stats = score10.agg(
        F.countDistinct("g").alias("n"),
        F.min("g").alias("lo"),
        F.max("g").alias("hi"),
        F.sum(F.when(F.col("g").isNull(), 1).otherwise(0)).alias("nulls"),
    ).head()
    # structural domain: softsign ∈ (0,1), round(,6) → ≤ 1,000,001 values
    assert stats["nulls"] == 0, "null scores would add a grid row"
    assert 0.0 <= stats["lo"] <= stats["hi"] <= 1.0, (stats["lo"], stats["hi"])
    assert stats["n"] <= 1_000_001, stats["n"]
    # measured occupancy at 10×: far below saturation AND far below the
    # corpus size is the healthy state; at saturation the structural cap
    # takes over (a ~1M-row / ~16 MB single-task window input, constant
    # in corpus size — bounded, and recorded here as the worst case)
    assert stats["n"] <= docs10.count(), stats["n"]
    covered.update(("classifier_auc_mann_whitney", "classifier_decile_lift"))

    missing = set(_BOUNDED_GLOBAL_WINDOWS) - covered
    extra = covered - set(_BOUNDED_GLOBAL_WINDOWS)
    assert not missing, f"allowlist entries without a 10x grid bound: {missing}"
    assert not extra, f"stale grid checks for de-allowlisted queries: {extra}"
