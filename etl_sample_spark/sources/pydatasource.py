"""Custom Python DataSource (Spark 4 DataSource API): a deterministic
synthetic-document source with partition planning and filter pushdown.

[EXT] S-family extension: the reference's only source is a blob
directory; a Spark-4-era engine also plugs arbitrary external systems
in as first-class sources. This module demonstrates the full contract —
``partitions()`` (parallel scan planning), ``pushFilters()`` (source-
side pruning, 4.1 API), and per-partition ``read()`` — on a generator
whose output is a pure function of (doc_id), so tests can assert
determinism, partition-layout invariance, and that pushdown actually
pruned work (the reader records which partitions it planned).

At scale this is the shape for reading from sharded services (one
InputPartition per shard, shard-key filters pushed) without staging
through files first.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

SCHEMA = "doc_id BIGINT, shard INT, text STRING"

# Same arithmetic family as operators/dedup.py::_token_hash: cheap,
# deterministic, engine-portable (tests recompute it in plain Python).
_WORDS = ("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta")


def synth_text(doc_id: int) -> str:
    return " ".join(
        _WORDS[(doc_id * 31 + i * 7) % len(_WORDS)] for i in range(4 + doc_id % 5)
    )


class _ShardPartition(InputPartition):
    def __init__(self, shard: int, start: int, end: int) -> None:
        self.shard = shard
        self.start = start
        self.end = end


def _block_size(options: dict, default_n_docs: int = 1000) -> int:
    """Contiguous-block size of the doc_id -> shard mapping, shared by
    the batch and streaming readers. An explicit ``docs_per_shard``
    option pins the mapping independently of ``n_docs`` (required when a
    checkpointed stream is resumed with a different n_docs — otherwise
    the ceil(n_docs/n_shards) fallback shifts shard boundaries between
    runs and the same doc_id lands in a different shard).

    ``default_n_docs`` must be each caller's OWN n_docs default (batch
    1000, streaming 50): an option-less stream otherwise computes
    per=ceil(1000/8)=125 and drops all 50 docs into shard 0."""
    explicit = int(options.get("docs_per_shard", 0))
    if explicit > 0:
        return explicit
    n_docs = int(options.get("n_docs", default_n_docs))
    n_shards = int(options.get("n_shards", 8))
    return -(-n_docs // n_shards)  # ceil-div


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n_docs = int(options.get("n_docs", 1000))
        self.per = _block_size(options)
        self.pushed_shard: int | None = None

    def pushFilters(self, filters):  # noqa: N802 — API name
        remaining = []
        for f in filters:
            # shard equality prunes whole partitions at plan time; all
            # other predicates stay with Spark.
            if isinstance(f, EqualTo) and f.attribute == ("shard",):
                self.pushed_shard = int(f.value)
            else:
                remaining.append(f)
        return remaining

    def partitions(self):
        per = self.per
        n_shards = -(-self.n_docs // per)  # ceil-div
        parts = [
            _ShardPartition(s, s * per, min((s + 1) * per, self.n_docs))
            for s in range(n_shards)
        ]
        if self.pushed_shard is not None:
            parts = [p for p in parts if p.shard == self.pushed_shard]
        if not parts:
            # PySpark's planner substitutes [None] for an empty partition
            # list and then calls read(None) — a fully-pruned (or empty)
            # source must return a sentinel empty range, not crash.
            parts = [_ShardPartition(-1, 0, 0)]
        return parts

    def read(self, partition: _ShardPartition):
        for doc_id in range(partition.start, partition.end):
            yield (doc_id, partition.shard, synth_text(doc_id))


class SyntheticDocsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> StructType | str:
        return SCHEMA

    def reader(self, schema: StructType) -> SyntheticDocsReader:
        return SyntheticDocsReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> "SyntheticDocsStreamReader":
        return SyntheticDocsStreamReader(self.options)


def register(spark) -> None:
    # Python-source filter pushdown ships disabled; the reader implements
    # pushFilters(), which Spark refuses to load without this flag
    # (runtime-settable).
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SyntheticDocsDataSource)


class SyntheticDocsStreamReader(SimpleDataSourceStreamReader):
    """Streaming half of the source (Spark 4 SimpleDataSourceStreamReader):
    emits ``batch_size`` documents per micro-batch from the same
    deterministic generator, with the offset = next doc_id to produce.
    Offsets are plain dicts checkpointed by Spark, so a restarted query
    resumes exactly where it stopped (pinned in test_pydatasource.py) —
    the contract a queue/ledger-backed source must honor for
    exactly-once.

    ``readBetweenOffsets`` (replay after restart) re-generates the same
    rows for the same offset range — determinism IS the replayability.
    """

    def __init__(self, options: dict) -> None:
        self.batch_size = int(options.get("batch_size", 10))
        self.max_docs = int(options.get("n_docs", 50))
        self.per = _block_size(options, default_n_docs=50)

    def _shard(self, doc_id: int) -> int:
        # SAME contiguous-block mapping as the batch reader, so a
        # checkpointed stream backfilled through the batch path assigns
        # identical shard values to identical doc_ids. Pass
        # ``docs_per_shard`` to keep the mapping stable when n_docs
        # changes across runs (checkpoint resume with a grown corpus);
        # without it, the mapping is only stable for a fixed
        # n_docs/n_shards configuration.
        return doc_id // self.per

    def initialOffset(self) -> dict:  # noqa: N802 — API name
        return {"next": 0}

    def read(self, start: dict):
        lo = int(start["next"])
        hi = min(lo + self.batch_size, self.max_docs)
        rows = [(i, self._shard(i), synth_text(i)) for i in range(lo, hi)]
        return iter(rows), {"next": hi}

    def readBetweenOffsets(self, start: dict, end: dict):  # noqa: N802
        return iter(
            (i, self._shard(i), synth_text(i))
            for i in range(int(start["next"]), int(end["next"]))
        )

    def commit(self, end: dict) -> None:
        pass  # nothing to acknowledge: the generator is stateless
