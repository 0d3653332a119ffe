"""Embedding clustering + SemDeDup-style semantic deduplication.

SemDeDup (Abbas et al. 2023) is the standard semantic-dedup recipe for
web-scale training data: k-means the corpus embeddings, then prune
near-duplicate pairs WITHIN each cluster (the cross-cluster pair space
is never touched, which is what makes 10^12 documents tractable — the
candidate-generation role k-means plays here is the same one LSH bands
play in ``dedup.minhash_lsh_pairs``).

Engine-exactness discipline (same as ``webgraph.pagerank_fixedpoint``):
everything runs in QUANTIZED integer space —

- vectors quantize once to milli-units (``round(x * 1000)`` as BIGINT),
- distances are integer squared-L2,
- assignment ties break on the lowest centroid index,
- centroid updates are truncating integer division (Spark ``div`` ==
  DuckDB ``//``; both truncate toward zero — NOT Python ``//``, which
  floors and diverges on negative sums),
- the within-cluster near-dup test is an integer dot-product threshold.

So the full k-means trajectory and the dedup verdicts are bit-identical
under any partitioning and reproducible by the DuckDB oracle (unrolled
iteration CTEs). Float k-means would drift by summation order and could
never be value-verified cross-engine.

Scale shape (10^12 rows):
- assignment is a zip_with/aggregate projection against a BROADCAST
  centroid literal (k*dim ints — bytes) — zero shuffle;
- the centroid update is one posexplode + (cluster, dim) hash aggregate
  (map-side partial combine; k*dim result rows collected to the driver,
  which is what makes the loop cheap);
- within-cluster pairing shuffles on the cluster id only; the exact
  all-pairs compare runs ONLY for clusters at or under
  ``max_cluster_rows`` — any oversized cluster (mis-parameterized k, or
  a pathological corpus where every embedding points the same way)
  falls back to hyperplane-LSH candidate generation WITHIN the cluster,
  so no single join key ever owes O(|C|^2) work. Parameterization rule
  (SemDeDup, Abbas et al. 2023 §3): pick k ≈ N / target_cluster_rows —
  they ran k = 50k over LAION so clusters stay in the tens-of-thousands;
  the guard makes a wrong k degrade recall marginally (LSH miss prob
  ~1e-11 at threshold 0.9 with 32x4 bands) instead of hanging a task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VEC_SCALE = 1000  # milli-unit vector quantization


def quantize_vectors(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding", scale: int = VEC_SCALE
) -> DataFrame:
    """(id, xq array<bigint>): the engine-exact integer form — cast to
    double BEFORE scaling (float32 * int arithmetic differs between
    engines; double is exact for these magnitudes)."""
    return emb.select(
        F.col(id_col).alias("id"),
        F.transform(
            F.col(vec_col), lambda x: F.round(x.cast("double") * scale).cast("long")
        ).alias("xq"),
    )


def _dist_expr(centroid: list[int]):
    """Integer squared-L2 distance of column ``xq`` to a centroid
    literal. max |coord| ~ scale -> the sum stays far below 2^63."""
    lit = F.lit(centroid).cast("array<bigint>")
    return F.aggregate(
        F.zip_with(F.col("xq"), lit, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def assign_clusters(vecs: DataFrame, centroids: list[list[int]]) -> DataFrame:
    """Adds ``cluster``: argmin of integer distance over the centroid
    list, ties to the lowest index. One codegen projection — the
    centroids ride into the plan as literals (broadcast-by-value)."""
    packed = F.array(
        *[
            F.struct(_dist_expr(c).alias("d"), F.lit(i).alias("cidx"))
            for i, c in enumerate(centroids)
        ]
    )
    return vecs.withColumn("cluster", F.array_min(packed)["cidx"])


def _trunc_div(a: int, n: int) -> int:
    """Truncating integer division (toward zero) — Spark ``div`` and
    DuckDB ``//`` semantics; Python ``//`` floors and would diverge on
    negative sums."""
    q = abs(a) // n
    return q if a >= 0 else -q


def kmeans_quantized(
    emb: DataFrame,
    k: int = 8,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = VEC_SCALE,
    keep_vec: bool = False,
) -> DataFrame:
    """Deterministic integer k-means: init = the k lowest-id vectors
    (quantized), then ``iterations`` rounds of {assign, truncated-mean
    update}; empty clusters keep their previous centroid. Returns
    (id, cluster) under the FINAL centroids — plus the quantized vector
    ``xq`` when ``keep_vec`` (so semantic_dedup consumes the assignment
    WITHOUT re-quantizing the corpus and joining it back).

    The per-round driver collect is k*dim BIGINTs (bytes); everything
    corpus-sized stays distributed."""
    vecs = quantize_vectors(emb, id_col, vec_col, scale)
    init_rows = vecs.orderBy("id").limit(k).collect()
    centroids = [list(r["xq"]) for r in sorted(init_rows, key=lambda r: r["id"])]
    dim = len(centroids[0])  # from the init collect — no extra job
    for _ in range(iterations):
        assigned = assign_clusters(vecs, centroids)
        sums = (
            assigned.select("cluster", F.posexplode("xq").alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        by_cluster: dict[int, dict[int, tuple[int, int]]] = {}
        for r in sums:
            by_cluster.setdefault(r["cluster"], {})[r["pos"]] = (r["s"], r["n"])
        new_centroids = []
        for i, prev in enumerate(centroids):
            dims = by_cluster.get(i)
            if not dims:  # empty cluster: keep previous centroid
                new_centroids.append(prev)
            else:
                new_centroids.append(
                    [_trunc_div(dims[p][0], dims[p][1]) for p in range(dim)]
                )
        centroids = new_centroids
    out_cols = [F.col("id").alias(id_col), F.col("cluster").cast("int").alias("cluster")]
    if keep_vec:
        out_cols.append(F.col("xq"))
    return assign_clusters(vecs, centroids).select(*out_cols)


def semantic_dedup(
    emb: DataFrame,
    k: int = 8,
    iterations: int = 2,
    sim_threshold_micro: int = 900_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = VEC_SCALE,
    max_cluster_rows: int | None = 10_000,
    lsh_bands: int = 32,
    lsh_rows_per_band: int = 4,
    lsh_seed: int = 7,
    dim: int = 64,
) -> DataFrame:
    """SemDeDup: within each k-means cluster, mark rows whose quantized
    dot product with a LOWER-id cluster member reaches the threshold
    (micro-units of cosine, assuming ~unit-norm inputs: the integer dot
    of two milli-unit vectors IS the cosine in micro-units). Output:
    (id, cluster, keep) — keep = no lower-id near-duplicate in the
    cluster, the deterministic keep-lowest rule every dedup family here
    uses.

    The pair join is an equi-join on the cluster id; nothing crosses
    clusters. The cosine re-check is native zip_with/aggregate codegen.

    Cluster-size guard: a within-cluster all-pairs join is quadratic in
    cluster size AND lands one cluster on one join key (= one task), so
    clusters above ``max_cluster_rows`` never take that path — their
    candidate pairs come from hyperplane-LSH buckets *within* the
    cluster (join key (cluster, band, sig); the exact integer-dot
    verdict is unchanged, only candidate recall differs: miss prob per
    true pair = (1 - p^r)^b ≈ 1.6e-11 at cosine 0.9 with the 32x4
    default). Parameterize k ≈ N / target_cluster_rows (SemDeDup used
    k = 50k for LAION); the guard turns a wrong k into a bounded,
    slightly-approximate run instead of a single-task O(|C|^2) hang.
    ``max_cluster_rows=None`` disables the guard (exact everywhere —
    the verification-corpus shape). ``dim`` is the embedding width used
    for the LSH planes on the fallback path."""
    both = (
        kmeans_quantized(emb, k, iterations, id_col, vec_col, scale, keep_vec=True)
        .select(F.col(id_col).alias("id"), "cluster", "xq")
        # three consumers (size census, pair generation, keep join-back):
        # evaluate the k-means assignment once
        .localCheckpoint(eager=False)
    )
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    if max_cluster_rows is None:
        a = both.select(F.col("id").alias("ia"), "cluster", F.col("xq").alias("va"))
        b = both.select(F.col("id").alias("ib"), "cluster", F.col("xq").alias("vb"))
        cand = a.join(b, "cluster").filter(F.col("ia") < F.col("ib")).select("ia", "ib", "va", "vb")
    else:
        sizes = both.groupBy("cluster").agg(F.count(F.lit(1)).alias("__csize"))
        flagged = both.join(F.broadcast(sizes), "cluster")  # k rows — always broadcastable
        small = flagged.filter(F.col("__csize") <= max_cluster_rows)
        a = small.select(F.col("id").alias("ia"), "cluster", F.col("xq").alias("va"))
        b = small.select(F.col("id").alias("ib"), "cluster", F.col("xq").alias("vb"))
        cand_small = (
            a.join(b, "cluster").filter(F.col("ia") < F.col("ib")).select("ia", "ib", "va", "vb")
        )
        from .linking import with_lsh_bands

        big = flagged.filter(F.col("__csize") > max_cluster_rows).select(
            "id",
            "cluster",
            "xq",
            F.transform("xq", lambda x: (x.cast("double") / scale).cast("float")).alias("vec"),
        )
        sig = with_lsh_bands(big, lsh_bands, lsh_rows_per_band, lsh_seed, dim=dim).select(
            "id", "cluster", "xq", F.posexplode("sigs").alias("band", "sig")
        )
        ca = sig.select(F.col("id").alias("ia"), "cluster", "band", "sig", F.col("xq").alias("va"))
        cb = sig.select(F.col("id").alias("ib"), "cluster", "band", "sig", F.col("xq").alias("vb"))
        cand_big = (
            ca.join(cb, ["cluster", "band", "sig"])
            .filter(F.col("ia") < F.col("ib"))
            .select("ia", "ib", "va", "vb")
            .dropDuplicates(["ia", "ib"])
        )
        cand = cand_small.unionByName(cand_big)
    dups = (
        cand.withColumn("dot", dot)
        .filter(F.col("dot") >= sim_threshold_micro)
        .select(F.col("ib").alias("id"))
        .distinct()
    )
    # one left join derives keep (dup-set miss == keep), instead of an
    # anti-join + semi-join + union that scans `both` twice
    dup_marks = dups.withColumn("__dup", F.lit(True))
    return both.join(dup_marks, "id", "left").select(
        F.col("id").alias(id_col), "cluster", F.col("__dup").isNull().alias("keep")
    )
