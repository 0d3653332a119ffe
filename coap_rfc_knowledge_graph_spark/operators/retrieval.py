"""Lexical (inverted-index) retrieval — term-matching top-k over the
corpus, the sparse complement to ``operators/similarity.py``'s dense
ANN. Training-data pipelines use it for benchmark-adjacent document
mining, dedup-by-query auditing, and retrieval-augmented labeling
(the M12 few-shot path retrieves by dense cosine; this is the BM25-
family analog).

Scoring is integer-exact so the driver can hash-verify it cross-engine:

    score(q, d) = sum over shared terms  tf(t, d) * (IDF_SCALE div df(t))

— tf the term's count in d, df its document frequency in the corpus,
floor division making the weight a BIGINT. That is a monotone
tf-idf: rare terms dominate, exactly like BM25's idf, without the
float log that would drift between engines. Ties break on doc_id asc.

Scale shape (10^12 docs):
- postings = one explode + one (term, doc) hash aggregate;
- df = one hash aggregate over postings (map-side combine);
- the query join shuffles on the term key. Hot terms ARE the skew —
  ``max_df`` drops terms appearing in more than that many documents
  (stop-word pruning: they carry ~zero idf weight anyway and their
  posting lists are the corpus);
- per-query top-k is a window over that query's candidates only
  (partitioned by query — never a global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IDF_SCALE = 1_000_000


def _terms(text_col: str):
    from ..functions.tokens import tokens_expr

    return tokens_expr(text_col)


def term_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(term, doc id, tf): the inverted index's posting rows."""
    return (
        docs.select(F.col(id_col), F.explode(_terms(text_col)).alias("term"))
        .groupBy("term", id_col)
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def doc_freq(postings: DataFrame) -> DataFrame:
    """(term, df): documents containing the term. Row-count per term is
    exact because ``term_postings`` emits one row per (term, doc)."""
    return postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))


def lexical_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "text",
    max_df: int | None = None,
) -> DataFrame:
    """Top-k corpus documents per query under the integer tf-idf score.
    Output: (query_id, rank, doc_id, score) — rank 1-based, ties by
    doc_id asc. Queries whose terms all miss (or were all df-pruned)
    emit no rows."""
    postings = term_postings(corpus, id_col, text_col)
    dfreq = doc_freq(postings)
    if max_df is not None:
        dfreq = dfreq.filter(F.col("df") <= max_df)
    weighted = postings.join(dfreq, "term").withColumn(
        "w", F.col("tf") * F.expr(f"{IDF_SCALE} div df")
    )
    qterms = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(F.array_distinct(_terms(query_text_col))).alias("term"),
    )
    scored = (
        qterms.join(weighted, "term")
        .groupBy("query_id", id_col)
        .agg(F.sum("w").alias("score"))
    )
    # a query matching a common term (especially with no max_df cut)
    # has corpus-scale candidates, so the cut is the skew-safe
    # two-level per-key top-k, not a per-query window sorting one
    # query's whole candidate set in a single task
    from ..functions.ranking import two_level_topk_per_key

    return two_level_topk_per_key(
        scored, ["query_id"], [F.desc("score"), F.asc(id_col)], k, rank_col="rank"
    ).select("query_id", "rank", F.col(id_col).alias("doc_id"), "score")
