"""Engine-native synthetic corpus source (Spark 4 Python DataSource
API): generate an arbitrarily large `documents`-shaped table with NO
input I/O — the scale-testing lever for the text/dedup operator
families (generate 1B docs across the cluster instead of shipping
them).

Usage::

    from resume_jd_matcher_spark.sources.synthdocs import register
    register(spark)
    df = (spark.read.format("synthdocs")
          .option("n", 100_000).option("partitions", 64)
          .option("seed", 7).load())

Every row is a pure function of (seed, doc_id), so the corpus is
deterministic across runs, partition counts, and cluster sizes —
retries and speculative tasks regenerate identical rows. Generation is
partition-parallel: each InputPartition owns a contiguous id range and
never touches the others (embarrassingly parallel, zero shuffle).

About 1 in 10 documents is generated as a near-duplicate of a base
document (token dropout over the same token stream), so dedup
operators have real work at any scale.
"""

from __future__ import annotations

import random

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"

_LANGS = ("en", "de", "es", "fr", "zh")
_SOURCES = ("crawl", "wiki", "forum", "news")
_VOCAB = [f"tok{i:03d}" for i in range(400)]


def _gen_row(seed: int, doc_id: int) -> tuple:
    # near-dup structure: ids with doc_id % 10 == 9 re-generate the
    # previous id's token stream and drop ~10% of tokens
    base_id = doc_id - 1 if doc_id % 10 == 9 and doc_id > 0 else doc_id
    rng = random.Random(seed * 1_000_003 + base_id)
    n_tok = rng.randint(30, 160)
    toks = rng.choices(_VOCAB, k=n_tok)
    if base_id != doc_id:
        drop = random.Random(seed * 7_000_003 + doc_id)
        toks = [t for t in toks if drop.random() > 0.1]
    text = " ".join(toks)
    meta = random.Random(seed * 11_000_003 + doc_id)
    return (
        doc_id,
        text,
        meta.choice(_LANGS),
        meta.choice(_SOURCES),
        len(text),
    )


class _Range(InputPartition):
    def __init__(self, lo: int, hi: int):
        self.lo, self.hi = lo, hi


class SynthDocsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n = int(options.get("n", 1000))
        self.n_parts = int(options.get("partitions", 8))
        self.seed = int(options.get("seed", 42))

    def partitions(self):
        # contiguous id ranges: deterministic regardless of partition
        # count (rows are functions of doc_id, not of the split)
        return [
            _Range(self.n * i // self.n_parts, self.n * (i + 1) // self.n_parts)
            for i in range(self.n_parts)
        ]

    def read(self, partition: _Range):
        for doc_id in range(partition.lo, partition.hi):
            yield _gen_row(self.seed, doc_id)


class SynthDocsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthdocs"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> SynthDocsReader:
        return SynthDocsReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SynthDocsDataSource)
