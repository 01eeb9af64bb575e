"""Byte-pair-encoding merge learning over the ``documents`` corpus.

The tokenizer-training operator an LLM data pipeline runs after
curation: learn the first K BPE merges from corpus word frequencies.

Reference analog: none ([EXT] LLM-pipeline surface, same family as
``token_count_bpe_ish`` / ``unigram_lm`` in plans/llm.py — but this one
LEARNS the vocabulary instead of applying a fixed one).

100 TB shape: the only corpus-sized step is the word-frequency count —
one map-side-combinable shuffle whose output is VOCABULARY-sized, not
corpus-sized. The merge loop then runs over that dictionary, bounded by
a deterministic top-V cap (count desc, word asc — the standard BPE
vocabulary truncation), the same bounded-collect discipline as the IVF
Lloyd loop (operators/similarity.py) and the driver-tier PageRank
(plans/analytics.py). Every loop iteration is integer arithmetic over
the dict; nothing per-round touches the corpus again.

Cross-engine determinism: merges are chosen by (pair_count DESC, left
ASC, right ASC) — exact integer counts with a total-order tie-break —
and the per-round merge application is the classic greedy left-to-right
fold, expressed in DuckDB as a seedless ``list_reduce`` over the symbol
list with a string accumulator (the ``F.aggregate``/``list_reduce``
bit-identical-fold precedent from the EWMA query). The Spark side runs
the identical fold in driver Python over the collected dict; both
engines see only exact integers and byte-equal strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_sample_spark import catalog
from etl_sample_spark.plans.registry import register
from etl_sample_spark.session import tune

_N_MERGES = 10
_TOP_V = 10000  # vocabulary cap: no-op at test scale, the bound at 100 TB


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune(spark)
    return catalog.table(spark, sf_dir, name)


def _bpe_learn(word_counts: list[tuple[str, int]], n_merges: int):
    """Classic BPE merge learning over a (word, count) dict: greedy
    leftmost-first merge application, (count DESC, pair ASC) selection.
    Pure integer/string arithmetic — engine-independent by construction."""
    seqs: list[tuple[list[str], int]] = [(list(w), c) for w, c in word_counts]
    merges: list[tuple[int, str, str, str, int]] = []
    for step in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for toks, c in seqs:
            for i in range(len(toks) - 1):
                pair = (toks[i], toks[i + 1])
                counts[pair] = counts.get(pair, 0) + c
        if not counts:
            break
        (left, right), n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merged = left + right
        merges.append((step, left, right, merged, n))
        new_seqs = []
        for toks, c in seqs:
            out = [toks[0]]
            for x in toks[1:]:
                if out[-1] == left and x == right:
                    out[-1] = merged
                else:
                    out.append(x)
            new_seqs.append((out, c))
        seqs = new_seqs
    return merges


def _oracle(carry_word: bool = False) -> str:
    """Unrolled-CTE DuckDB twin: w0 = char-split vocab, then per round
    pair-count -> arg-max -> list_reduce greedy fold. An exhausted pair
    table empties every later round's CTEs, matching the Python break.
    ``carry_word=True`` threads the original word through every round
    (for application-side oracles that need the final word -> seq map);
    the default emits byte-identical SQL to the pre-parameter version."""
    wcol = "w.word, " if carry_word else ""
    w0col = "word, " if carry_word else ""
    parts = [
        f"""
    WITH wc AS (
      SELECT word, COUNT(*) AS cnt
      FROM (SELECT UNNEST(string_split(text, ' ')) AS word FROM documents)
      WHERE word <> ''
      GROUP BY word
      ORDER BY cnt DESC, word
      LIMIT {_TOP_V}),
    w0 AS (
      SELECT {w0col}array_to_string(string_split(word, ''), ' ') AS seq, cnt
      FROM wc)"""
    ]
    for k in range(1, _N_MERGES + 1):
        p, b, wprev, wnext = f"p{k}", f"b{k}", f"w{k-1}", f"w{k}"
        parts.append(f"""
    {p} AS (
      SELECT toks[i] AS l, toks[i + 1] AS r, SUM(cnt) AS s
      FROM (SELECT string_split(seq, ' ') AS toks, cnt FROM {wprev}),
           LATERAL UNNEST(generate_series(1, len(toks) - 1)) AS g(i)
      GROUP BY 1, 2),
    {b} AS (
      SELECT l, r, CAST(s AS BIGINT) AS s FROM {p}
      ORDER BY s DESC, l, r LIMIT 1),
    {wnext} AS (
      SELECT {wcol}list_reduce(
               string_split(w.seq, ' '),
               (acc, x) -> CASE
                 WHEN string_split(acc, ' ')[-1] = b.l AND x = b.r
                 THEN substr(acc, 1, length(acc) - length(b.l)) || b.l || b.r
                 ELSE acc || ' ' || x END) AS seq,
             w.cnt
      FROM {wprev} w, {b} b)""")
    unions = "\n    UNION ALL ".join(
        f"SELECT {k} AS step, l AS left_sym, r AS right_sym, "
        f"l || r AS merged, s AS pair_count FROM b{k}"
        for k in range(1, _N_MERGES + 1)
    )
    return ",".join(parts) + f"\n    SELECT * FROM ({unions}) ORDER BY step"


def _apply_oracle() -> str:
    """Application-side twin: the same unrolled merge chain carrying the
    word column, then per-document fertility from the final word->seq
    segmentation map joined back onto the exploded corpus."""
    wcol = "w.word, "
    w0col = "word, "
    parts = [
        f"""
    WITH wc AS (
      SELECT word, COUNT(*) AS cnt
      FROM (SELECT UNNEST(string_split(text, ' ')) AS word FROM documents)
      WHERE word <> ''
      GROUP BY word
      ORDER BY cnt DESC, word
      LIMIT {_TOP_V}),
    w0 AS (
      SELECT {w0col}array_to_string(string_split(word, ''), ' ') AS seq, cnt
      FROM wc)"""
    ]
    for k in range(1, _N_MERGES + 1):
        p, b, wprev, wnext = f"p{k}", f"b{k}", f"w{k-1}", f"w{k}"
        parts.append(f"""
    {p} AS (
      SELECT toks[i] AS l, toks[i + 1] AS r, SUM(cnt) AS s
      FROM (SELECT string_split(seq, ' ') AS toks, cnt FROM {wprev}),
           LATERAL UNNEST(generate_series(1, len(toks) - 1)) AS g(i)
      GROUP BY 1, 2),
    {b} AS (
      SELECT l, r, CAST(s AS BIGINT) AS s FROM {p}
      ORDER BY s DESC, l, r LIMIT 1),
    {wnext} AS (
      SELECT {wcol}list_reduce(
               string_split(w.seq, ' '),
               (acc, x) -> CASE
                 WHEN string_split(acc, ' ')[-1] = b.l AND x = b.r
                 THEN substr(acc, 1, length(acc) - length(b.l)) || b.l || b.r
                 ELSE acc || ' ' || x END) AS seq,
             w.cnt
      FROM {wprev} w, {b} b)""")
    tail = f""",
    seg AS (
      SELECT word, len(string_split(seq, ' ')) AS n_tok
      FROM w{_N_MERGES}),
    corpus AS (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS word FROM documents)
    SELECT c.doc_id,
           CAST(COUNT(*) AS BIGINT)        AS n_words,
           CAST(SUM(s.n_tok) AS BIGINT)    AS n_bpe_tokens,
           SUM(s.n_tok) * 1.0 / COUNT(*)   AS fertility
    FROM corpus c JOIN seg s USING (word)
    WHERE c.word <> ''
    GROUP BY c.doc_id
    ORDER BY c.doc_id"""
    return ",".join(parts) + tail


@register(
    "bpe_merge_learning",
    _oracle(),
    doc="Learn the first 10 BPE merges from documents word frequencies: "
    "distributed word count (one map-side-combinable shuffle, output "
    "vocabulary-sized) -> deterministic top-V dictionary -> greedy "
    "merge loop over the dict (driver-bounded like the IVF Lloyd "
    "loop). Merge choice is (exact count DESC, pair ASC); application "
    "is the classic leftmost-first fold, mirrored in the oracle as an "
    "unrolled CTE chain with a seedless list_reduce string fold.",
)
def bpe_merge_learning(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    wc = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "word")
        .limit(_TOP_V)
    )
    # Bounded collect: vocabulary-sized by the top-V cap (see module doc).
    word_counts = [(r["word"], r["cnt"]) for r in wc.collect()]
    merges = _bpe_learn(word_counts, _N_MERGES)
    if not merges:
        return spark.createDataFrame(
            [], "step int, left_sym string, right_sym string, merged string, pair_count bigint"
        )
    return spark.createDataFrame(
        merges,
        "step int, left_sym string, right_sym string, merged string, pair_count bigint",
    ).orderBy("step")



@register(
    "bpe_apply_fertility",
    _apply_oracle(),
    doc="APPLY the learned BPE merges back to the corpus: per document, "
    "word count, BPE token count under the 10 learned merges, and "
    "fertility (tokens per word) — the measurement that closes the "
    "tokenizer-training loop (bpe_merge_learning) into an application "
    "and the number a training-mix budget actually consumes. The "
    "segmentation map is computed ONCE per distinct word (driver-side "
    "over the bounded dictionary, same discipline as training) and "
    "joined back onto the exploded corpus — AQE broadcasts the "
    "vocabulary-sized map. Fertility is an unrounded exact-integer "
    "ratio. Oracle: the training CTE chain re-run carrying the word "
    "column, then the same join-back in SQL.",
)
def bpe_apply_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    wc = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "word")
        .limit(_TOP_V)
    )
    word_counts = [(r["word"], r["cnt"]) for r in wc.collect()]
    merges = _bpe_learn(word_counts, _N_MERGES)
    # apply the merge list to each dictionary word (greedy leftmost
    # fold per round — identical to training's application step)
    seg: dict[str, int] = {}
    for word, _ in word_counts:
        toks = list(word)
        for _, left, right, merged, _n in merges:
            out = [toks[0]]
            for x in toks[1:]:
                if out[-1] == left and x == right:
                    out[-1] = merged
                else:
                    out.append(x)
            toks = out
        seg[word] = len(toks)
    seg_df = F.broadcast(
        docs.sparkSession.createDataFrame(
            list(seg.items()), "word string, n_tok int"
        )
    )
    corpus = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).where(F.col("word") != "")
    return (
        corpus.join(seg_df, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("n_tok").cast("bigint").alias("n_bpe_tokens"),
            (F.sum("n_tok") * F.lit(1.0) / F.count(F.lit(1))).alias("fertility"),
        )
        .orderBy("doc_id")
    )