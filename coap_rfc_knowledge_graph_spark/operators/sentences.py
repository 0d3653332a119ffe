"""pages -> sentences: the S1/S2 + P1-P7 stage (SURVEY §2.1-2.2).

One document is processed whole (the reference cleanup is stateful across
a document — body slicing, positional splices — so the UDF is
document-at-a-time, never line-parallel within a doc). Parallelism is
across documents: the input is hash-partitioned by ``url`` (the north
rule's partitioning key) and each Arrow batch fans a page out into
(url, sent_id, sentence) rows via ``mapInPandas``.

Scale notes: the only shuffle is the explicit repartition by url (which
downstream stages reuse — mentions, pairs and the sentence join are all
url-keyed, so Spark can avoid re-shuffling). Column pruning is explicit:
only (url, html, text, lang) reach the Python worker.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text_extract import extract_document

SENTENCES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("sent_id", T.IntegerType()),
        T.StructField("sentence", T.StringType()),
    ]
)


def extract_sentences(pages: DataFrame, url_partitions: int | None = None) -> DataFrame:
    """pages -> sentences(url, sent_id, sentence), sent_id = 0-based
    position within the document (the alignment key replacing the
    reference's parallel-list indexing)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls: list[str] = []
            ids: list[int] = []
            sents: list[str] = []
            for url, html, text, lang in zip(pdf["url"], pdf["html"], pdf["text"], pdf["lang"]):
                doc_sents = extract_document(url, html, text, lang)
                urls.extend([url] * len(doc_sents))
                ids.extend(range(len(doc_sents)))
                sents.extend(doc_sents)
            yield pd.DataFrame({"url": urls, "sent_id": pd.array(ids, dtype="int32"), "sentence": sents})

    pruned = pages.select("url", "html", "text", "lang")
    if url_partitions:
        pruned = pruned.repartition(url_partitions, "url")
    return pruned.mapInPandas(fn, SENTENCES_SCHEMA)
