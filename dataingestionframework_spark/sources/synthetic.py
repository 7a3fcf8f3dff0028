"""Synthetic-corpus generator as a custom Python DataSource (Spark 4
``pyspark.sql.datasource`` API).

Scale testing needs corpora bigger than you want to store: this source
GENERATES documents deterministically, sharded across
``numPartitions`` input partitions — each executor task derives its
shard purely from (seed, partition_id), so a 10⁹-doc corpus costs zero
storage and no driver bottleneck. The same (seed, n_docs) always
yields the same corpus, so tests and benchmarks are reproducible at
any scale.

Usage::

    spark.dataSource.register(SyntheticCorpusDataSource)
    df = (spark.read.format("synthetic_corpus")
          .option("n_docs", 100000)
          .option("numPartitions", 32)
          .option("seed", 7)
          .load())
    # doc_id long, text string, lang string, n_chars int
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_WORDS = (
    "data stream batch row column table scan filter join agg sort hash "
    "merge shuffle spill value key line order part fast slow small large "
    "the a of and to in is on for customer supplier region nation"
).split()

_LANGS = ("en", "es", "fr", "de", "zh")


def _mix(x: int) -> int:
    """splitmix64 finalizer — cheap deterministic PRNG step."""
    x = (x + 0x9E3779B97F4A7C15) & (2**64 - 1)
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & (2**64 - 1)
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & (2**64 - 1)
    return x ^ (x >> 31)


def make_document(doc_id: int, seed: int) -> tuple[int, str, str, int]:
    """One deterministic synthetic document — pure function of
    (doc_id, seed), so any partitioning yields the same corpus."""
    h = _mix(doc_id * 2654435761 + seed)
    n_tokens = 20 + h % 60
    toks = []
    for i in range(n_tokens):
        h = _mix(h + i)
        toks.append(_WORDS[h % len(_WORDS)])
    text = " ".join(toks)
    lang = _LANGS[_mix(h + doc_id) % len(_LANGS)]
    return doc_id, text, lang, len(text)


class _ShardPartition(InputPartition):
    def __init__(self, start: int, end: int, seed: int):
        self.start, self.end, self.seed = start, end, seed


class SyntheticCorpusReader(DataSourceReader):
    def __init__(self, options):
        self.n_docs = int(options.get("n_docs", 1000))
        self.n_parts = int(options.get("numPartitions", 8))
        self.seed = int(options.get("seed", 42))

    def partitions(self):
        per = -(-self.n_docs // self.n_parts)  # ceil
        return [
            _ShardPartition(i * per, min((i + 1) * per, self.n_docs), self.seed)
            for i in range(self.n_parts)
            if i * per < self.n_docs
        ]

    def read(self, partition: _ShardPartition):
        for doc_id in range(partition.start, partition.end):
            yield make_document(doc_id, partition.seed)


class SyntheticCorpusStreamReader(SimpleDataSourceStreamReader):
    """Unbounded synthetic corpus stream (Spark 4 Python streaming
    DataSource API): each micro-batch emits the next
    ``docs_per_batch`` documents of the same deterministic corpus the
    batch reader generates — a rate-controlled load generator for
    streaming-pipeline tests with zero storage.

    Offsets are plain doc ordinals, so checkpoint/restart resumes at
    the exact document; replayed ranges regenerate identical rows
    (deterministic generator ⇒ exactly-once downstream stays honest).
    """

    def __init__(self, options):
        self.seed = int(options.get("seed", 42))
        self.per_batch = int(options.get("docs_per_batch", 100))
        self.max_docs = int(options.get("max_docs", 10**12))

    def initialOffset(self):  # noqa: N802 (Spark API names)
        return {"next": 0}

    # Spark 4.1's data_source_read_func requires a true ITERATOR from
    # both paths — a bare list raises DATA_SOURCE_INVALID_RETURN_TYPE.
    # read() gets away with a list on the happy path (it is re-wrapped
    # driver-side), but the restart replay calls readBetweenOffsets on
    # an executor and fails the stream; return iterators from both so
    # neither path depends on where Spark evaluates it.
    def read(self, start):
        lo = start["next"]
        hi = min(lo + self.per_batch, self.max_docs)
        rows = iter([make_document(i, self.seed) for i in range(lo, hi)])
        return rows, {"next": hi}

    def readBetweenOffsets(self, start, end):  # noqa: N802 — replay path
        return iter(
            [make_document(i, self.seed) for i in range(start["next"], end["next"])]
        )


class SyntheticCorpusDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_corpus"

    def schema(self) -> str:
        return "doc_id long, text string, lang string, n_chars int"

    def reader(self, schema) -> SyntheticCorpusReader:
        return SyntheticCorpusReader(self.options)

    def simpleStreamReader(self, schema) -> SyntheticCorpusStreamReader:  # noqa: N802
        return SyntheticCorpusStreamReader(self.options)
