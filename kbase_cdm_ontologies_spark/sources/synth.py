"""Distributed synthetic pages source: generate the Common-Crawl-style
pages table ON THE EXECUTORS (mapInPandas over spark.range), so corpus
size is bounded by cluster capacity, not driver memory.

Per-page determinism (corpus.render_page seeds an RNG with
``{seed}:{page_index}``) guarantees driver-side and distributed
generation emit byte-identical rows regardless of partitioning — the
property the text-extraction invariant tests rely on.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .corpus import Corpus, CorpusSpec, _build_ontology, page_context

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def generate_pages_distributed(
    spark: SparkSession, spec: CorpusSpec, num_partitions: int | None = None
) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) for spec.n_pages rows,
    generated executor-side."""
    import random as _random

    c = Corpus(spec=spec)
    aliases = _build_ontology(c, _random.Random(spec.seed))
    ctx = page_context(c, aliases)
    bcast = spark.sparkContext.broadcast(ctx)
    parts = num_partitions or spark.sparkContext.defaultParallelism * 4

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .corpus import render_page

        ctx_local = bcast.value
        for pdf in batches:
            rows = [render_page(int(i), ctx_local) for i in pdf["id"]]
            yield pd.DataFrame(rows)

    return (
        spark.range(0, spec.n_pages, numPartitions=parts)
        .mapInPandas(_gen, PAGES_SCHEMA)
    )
