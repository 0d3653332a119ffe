"""Exact-substring dedup (Lee et al. 2022, "Deduplicating Training
Data Makes Language Models Better") — the distributed approximation.

The reference method builds a corpus-wide suffix array and removes
every substring of >= 50 tokens that appears twice. A suffix array is
a single-machine structure; the Spark-native stand-in is
CONTENT-DEFINED CHUNKING (the CDC idea from dedup storage systems):

1. split each doc into word tokens;
2. a token whose hash falls in 1/p of the hash space is an ANCHOR;
   anchors open a new chunk. Boundaries depend only on CONTENT, so two
   copies of a duplicated run chunk identically no matter where in
   their documents they sit. (A fixed-stride window scheme — the
   obvious first cut — silently requires the two copies to agree on
   their offset modulo the stride, which real duplicates don't.)
3. md5 each chunk's text and count occurrences corpus-wide: one hash
   aggregation, the distributed replacement for the suffix array's
   "appears twice" test (within-doc repeats count, as in the paper);
4. per doc, merge runs of contiguous duplicated chunks into maximal
   spans (gaps-and-islands over a per-DOC analytic window — no global
   sort) and keep spans of >= ``min_span`` tokens (the paper's 50);
5. rewrite each doc's text with span tokens dropped via an array
   lambda over the doc's own few spans — text never shuffles; only
   (hash, int, int) chunk rows do.

Approximation contract: expected chunk length is ``p`` tokens, so a
duplicated run loses only its sub-chunk prefix/suffix before the first
/ after the last shared anchor (~p tokens each side); runs of
>= min_span + 2p tokens are caught with high probability, shorter
ones may escape. The island length
test (``min_span``) is the removal gate: every chunk with a repeated
hash — including 1-token chunks of a common anchored word — is a
candidate, but a span only falls when >= min_span consecutive tokens
are all chunk-duplicated. The residual false-positive mode (a 50-token
stretch whose every chunk independently repeats elsewhere without the
stretch itself repeating) requires coincident verbatim repetition of
~p-token pieces end to end, which natural text essentially never
produces below true duplication; filtering short chunks instead would
punch holes in genuinely duplicated runs and split their islands.

Scale shape: one corpus-wide token posexplode (the same exploded-row
form the winnowing operator settled on after its all-array form proved
quadratic in Catalyst), per-doc window functions, one chunk-hash count
aggregation, one join back on (doc, chunk). Every shuffle is keyed on
doc_id or a chunk hash; skew is bounded by doc length, not corpus
size. All hashes are md5-prefix arithmetic, mirrored verbatim by the
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _tokens(text_col: str):
    return F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")


def _hash_bucket(col, p: int):
    """md5-prefix integer in [0, p) — the engine-portable hash (the
    same conv(substr(md5)) trick the minhash oracle uses)."""
    return F.pmod(F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long"), F.lit(p))


def doc_chunks(
    docs: DataFrame,
    p: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Content-defined chunks: (doc_id, chunk_id, start, end, n_chunk,
    chash). ``end`` exclusive; chunk_id is 0-based per doc in token
    order; every doc's chunks tile [0, n_tokens) exactly."""
    toks = _tokens(text_col)
    exploded = docs.select(
        F.col(id_col).alias("doc_id"), F.posexplode(toks).alias("pos", "tok")
    ).withColumn("is_anchor", (_hash_bucket(F.col("tok"), p) == 0).cast("int"))
    order = Window.partitionBy("doc_id").orderBy("pos")
    # an anchor OPENS a chunk; tokens before the first anchor form
    # chunk 0 (sum is 0 there) — cum-sum then dense ids via the chunk
    # grouping itself
    with_chunk = exploded.withColumn(
        "chunk_key", F.sum("is_anchor").over(order.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        with_chunk.groupBy("doc_id", "chunk_key")
        .agg(
            F.min("pos").alias("start"),
            (F.max("pos") + 1).alias("end"),
            F.count("*").alias("n_chunk"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "tok"))), lambda s: s["tok"]
                    ),
                )
            ).alias("chash"),
        )
        .withColumnRenamed("chunk_key", "chunk_id")
    )


def duplicate_spans(
    docs: DataFrame,
    p: int = 16,
    min_span: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Maximal duplicated token spans of >= ``min_span`` tokens:
    (doc_id, span_start, span_end, n_chunks)."""
    # the chunk table feeds BOTH the hash-count side and the join-back
    # side; without truncating lineage the token explode + per-doc
    # window would evaluate twice (the clean_corpus double-eval class
    # from VERDICT r3). Lazy local checkpoint: materialized once on
    # first use, shared by both consumers.
    chunks = doc_chunks(docs, p, id_col, text_col).localCheckpoint(eager=False)
    counts = chunks.groupBy("chash").agg(F.count("*").alias("n_occ"))
    dup = (
        chunks.join(counts, on="chash")
        .filter(F.col("n_occ") > 1)
        .select("doc_id", "start", "end")
    )
    order = Window.partitionBy("doc_id").orderBy("start", "end")
    prev_max_end = F.max("end").over(order.rowsBetween(Window.unboundedPreceding, -1))
    flagged = dup.withColumn(
        "new_island", (prev_max_end.isNull() | (F.col("start") > prev_max_end)).cast("int")
    )
    islands = flagged.withColumn(
        "island", F.sum("new_island").over(order.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        islands.groupBy("doc_id", "island")
        .agg(
            F.min("start").alias("span_start"),
            F.max("end").alias("span_end"),
            F.count("*").alias("n_chunks"),
        )
        .filter(F.col("span_end") - F.col("span_start") >= min_span)
        .drop("island")
    )


def remove_duplicate_spans(
    docs: DataFrame,
    p: int = 16,
    min_span: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """docs -> (doc_id, text_kept, n_tokens, n_removed): every
    corpus-duplicated run of >= min_span tokens excised; untouched
    docs pass through BYTE-identical (original whitespace/newlines
    preserved — only docs that actually lose a span get rewritten in
    single-space token-joined form, since excision is token-level).

    ``docs`` is consumed twice (span derivation + rewrite join-back);
    callers passing a COMPUTED plan rather than a table scan should
    localCheckpoint it first — the chunk table inside is already
    checkpointed, so the second consumer re-reads only ``docs``."""
    spans = (
        duplicate_spans(docs, p, min_span, id_col, text_col)
        .groupBy("doc_id")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(F.col("span_start").alias("s"), F.col("span_end").alias("e"))
                )
            ).alias("spans")
        )
    )
    toks = _tokens(text_col)
    joined = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("__text"),
        toks.alias("__toks"),
    ).join(spans, on="doc_id", how="left")
    pos_kept = F.filter(
        F.transform(F.col("__toks"), lambda t, i: F.struct(t.alias("t"), i.alias("i"))),
        lambda x: ~F.exists(F.col("spans"), lambda sp: (x["i"] >= sp["s"]) & (x["i"] < sp["e"])),
    )
    kept = F.transform(pos_kept, lambda x: x["t"])
    n_kept = F.when(F.col("spans").isNull(), F.size("__toks")).otherwise(F.size(kept))
    return joined.select(
        "doc_id",
        # untouched docs keep their original bytes; only rewritten ones
        # collapse to the token-joined form
        F.when(F.col("spans").isNull(), F.col("__text"))
        .otherwise(F.array_join(kept, " "))
        .alias("text_kept"),
        F.size("__toks").cast("long").alias("n_tokens"),
        (F.size("__toks") - n_kept).cast("long").alias("n_removed"),
    )
