"""Integer k-means + SemDeDup (operators/clustering.py)."""

from __future__ import annotations

from coap_rfc_knowledge_graph_spark.operators.clustering import (
    _trunc_div,
    kmeans_quantized,
    semantic_dedup,
)


def _emb(spark, rows, dim):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        f"vec_id long, embedding array<float>",
    )


def test_trunc_div_matches_sql_semantics():
    assert _trunc_div(7, 2) == 3
    assert _trunc_div(-7, 2) == -3  # Spark div / DuckDB //, NOT Python -7//2 == -4
    assert _trunc_div(0, 5) == 0


def test_kmeans_separates_obvious_groups(spark):
    rows = [
        (0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [1.0, 0.1]),
        (3, [0.0, 1.0]), (4, [0.1, 0.9]), (5, [0.0, 0.9]),
    ]
    got = {r.vec_id: r.cluster for r in kmeans_quantized(_emb(spark, rows, 2), k=2, iterations=2).collect()}
    # init centroids = vecs 0 and 1 (both group A); after an update round
    # the clusters must separate the two groups, whatever their labels
    assert got[0] == got[1] == got[2]
    assert got[3] == got[4] == got[5]
    assert got[0] != got[3]


def test_kmeans_partitioning_invariant(spark):
    rows = [(i, [((i * 13 + d) % 7) / 7.0 for d in range(4)]) for i in range(40)]
    e = _emb(spark, rows, 4)
    a = {r.vec_id: r.cluster for r in kmeans_quantized(e, k=3, iterations=2).collect()}
    b = {r.vec_id: r.cluster for r in kmeans_quantized(e.repartition(8), k=3, iterations=2).collect()}
    assert a == b


def test_kmeans_negative_coordinates_deterministic(spark):
    # negative sums exercise the truncating division branch
    rows = [(i, [-0.5 + 0.01 * (i % 3), 0.3 - 0.02 * (i % 5)]) for i in range(12)]
    e = _emb(spark, rows, 2)
    a = {r.vec_id: r.cluster for r in kmeans_quantized(e, k=2, iterations=3).collect()}
    b = {r.vec_id: r.cluster for r in kmeans_quantized(e.repartition(5), k=2, iterations=3).collect()}
    assert a == b


def test_kmeans_empty_cluster_keeps_previous_centroid(spark):
    # k=3 over two tight groups: one centroid ends up empty after the
    # first assignment; the run must still complete deterministically
    rows = [(0, [1.0, 0.0]), (1, [1.0, 0.01]), (2, [0.99, 0.0]), (3, [0.0, 1.0])]
    got = kmeans_quantized(_emb(spark, rows, 2), k=3, iterations=2).collect()
    assert len(got) == 4  # every row assigned


def test_semantic_dedup_keep_lowest_within_cluster(spark):
    rows = [
        (0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [0.999, 0.001]),  # near-dup triple
        (3, [0.0, 1.0]), (4, [0.0, 1.0]),                       # near-dup pair
        (5, [0.7, 0.7]),
    ]
    got = {r.vec_id: (r.cluster, r.keep) for r in semantic_dedup(
        _emb(spark, rows, 2), k=2, iterations=2, sim_threshold_micro=990_000
    ).collect()}
    assert got[0][1] is True and got[1][1] is False and got[2][1] is False
    assert got[3][1] is True and got[4][1] is False
    assert got[5][1] is True
    assert len(got) == 6


def test_semantic_dedup_never_crosses_clusters(spark):
    # identical vectors forced into different clusters by construction
    # would NOT dedup — SemDeDup's documented recall boundary. Here we
    # assert the complement: everything in one cluster dedups fully.
    rows = [(i, [1.0, 0.0]) for i in range(5)]
    got = {r.vec_id: r.keep for r in semantic_dedup(
        _emb(spark, rows, 2), k=1, iterations=1, sim_threshold_micro=990_000
    ).collect()}
    assert got[0] is True and all(got[i] is False for i in range(1, 5))


def test_semantic_dedup_guard_bounds_oversized_cluster_pairs(spark):
    """One-giant-cluster corpus (every vector in the same k-means
    cluster): with the guard engaged the within-cluster all-pairs join
    must be GONE from the plan — candidates come from (cluster, band,
    sig) LSH buckets — while near-identical rows still dedup to the
    keep-lowest rule and exact-path results are preserved for small
    clusters (guard disabled == guard with a huge cap)."""
    import math

    # 120 rows, all near [1, 0, ...]: one cluster, every adjacent pair a
    # near-dup (cosine ~ 1), so recall failures would be visible.
    dim = 8
    rows = []
    for i in range(120):
        eps = (i % 7) * 1e-4
        v = [1.0] + [eps] * (dim - 1)
        n = math.sqrt(sum(x * x for x in v))
        rows.append((i, [x / n for x in v]))
    emb = _emb(spark, rows, dim)

    guarded = semantic_dedup(
        emb, k=1, iterations=1, sim_threshold_micro=990_000,
        max_cluster_rows=16, dim=dim,
    )
    plan = guarded._jdf.queryExecution().optimizedPlan().toString()
    # the oversized-cluster branch joins on (cluster, band, sig), never
    # on cluster alone for the big side; the small side is empty here
    assert "band" in plan and "sig" in plan
    got = {r.vec_id: r.keep for r in guarded.collect()}
    assert got[0] is True
    assert sum(1 for v in got.values() if not v) >= 118  # all but the keeper(s)

    exact = {
        r.vec_id: r.keep
        for r in semantic_dedup(
            emb, k=1, iterations=1, sim_threshold_micro=990_000,
            max_cluster_rows=None,
        ).collect()
    }
    assert got == exact  # LSH recall at cosine~1 is total here


def test_semantic_dedup_guard_exact_below_cap(spark):
    """Clusters at or under the cap keep byte-identical verdicts vs the
    unguarded operator (the sf0.01 oracle corpus shape)."""
    rows = [
        (0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [0.999, 0.001]),
        (3, [0.0, 1.0]), (4, [0.0, 1.0]), (5, [0.7, 0.7]),
    ]
    kw = dict(k=2, iterations=2, sim_threshold_micro=990_000)
    a = sorted(tuple(r) for r in semantic_dedup(_emb(spark, rows, 2), **kw).collect())
    b = sorted(
        tuple(r)
        for r in semantic_dedup(_emb(spark, rows, 2), max_cluster_rows=None, **kw).collect()
    )
    assert a == b
