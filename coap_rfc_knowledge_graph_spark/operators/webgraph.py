"""Graph analytics over the materialized KG / web-link edge tables —
the queries a knowledge-graph consumer runs AFTER construction (entity
importance, hub detection, neighborhood statistics) and a web-corpus
curator runs over the crawl's link graph (PageRank-weighted sampling is
a standard training-data curation signal; see Common Crawl's harmonic-
centrality ranks).

Not present in the reference repo (its graph lives in a pickled
networkx-style dict and is only ever traversed for contradiction
checks); this family belongs to the "queries over the constructed
graph" surface, same tier as ``operators/contradictions.py``.

Engine-exactness discipline: PageRank is computed in FIXED-POINT
INTEGER arithmetic (BIGINT micro-units, floor division) so the result
is bit-identical under any partitioning, any summation order, and in
the DuckDB oracle — float PageRank would drift by summation order and
could never be value-hash-verified across engines. The floor leaks
O(1) micro-units of mass per edge per iteration (bounded, documented);
ranking order is unaffected for any realistically-sized graph.

Scale shape (10^12 edges):
- every iteration is one equi-join of ranks onto edges keyed ``src``
  plus one hash aggregate keyed ``dst`` — two shuffles of the edge
  table per iteration, the textbook distributed-PageRank plan. Edges
  are re-used across iterations: pre-partition them on ``src`` once
  (``prepartition``) so only the (node-sized) rank table re-shuffles.
- ranks are localCheckpoint'ed every ``checkpoint_every`` iterations to
  cut lineage growth (an unbounded iterative plan otherwise re-plans
  O(k) joins at every action).
- degree/triangle/2-hop are single-pass joins + aggregates with
  map-side partial combine; triangle enumeration canonicalizes a<b so
  each triangle is produced exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# fixed-point scale: ranks are in millionths (BIGINT). With damping
# 85/100 and rank mass <= N * SCALE, the per-edge product
# rank * DAMP_NUM stays far below 2^63 for any N < 10^14.
SCALE = 1_000_000
DAMP_NUM = 85
DAMP_DEN = 100


def edges_from_triples(
    triples: DataFrame, src_col: str = "subj_id", dst_col: str = "obj_id"
) -> DataFrame:
    """Adapter: the flagship's (subj, pred, obj) triple table -> the
    (src, dst) edge table every operator here consumes. Distinct
    entity-pair edges, self-loops kept (PageRank treats them as valid
    out-links; triangle/undirected ops drop them themselves)."""
    return triples.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()


def graph_nodes(edges: DataFrame) -> DataFrame:
    """Distinct node set of a directed edge table (src, dst)."""
    return (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )


def degree_stats(edges: DataFrame) -> DataFrame:
    """(node, out_degree, in_degree, degree): directed degree counts
    with zero-fill over the full node set. Two hash aggregates + two
    broadcast-or-shuffle joins on the node key; at web scale the
    aggregates' map-side partial combine makes this one shuffle of one
    row per (task, node)."""
    out_d = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("out_degree")
    )
    in_d = edges.groupBy(F.col("dst").alias("node")).agg(
        F.count(F.lit(1)).alias("in_degree")
    )
    return (
        graph_nodes(edges)
        .join(out_d, "node", "left")
        .join(in_d, "node", "left")
        .select(
            "node",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
            (F.coalesce("out_degree", F.lit(0)) + F.coalesce("in_degree", F.lit(0))).alias(
                "degree"
            ),
        )
    )


def pagerank_fixedpoint(
    edges: DataFrame,
    iterations: int = 4,
    scale: int = SCALE,
    damp_num: int = DAMP_NUM,
    damp_den: int = DAMP_DEN,
    prepartition: int | None = None,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Fixed-point integer PageRank: after ``iterations`` rounds returns
    (node, rank) with rank in micro-units (BIGINT).

    Update rule (all BIGINT, floor division — exact in every engine):

        rank0(v)   = scale
        contrib(u) = (rank(u) * damp_num) div (damp_den * out_degree(u))
        rank'(v)   = (scale * (damp_den - damp_num)) div damp_den
                     + sum over in-edges contrib(u)

    Dangling nodes (no out-edges) leak their damped mass — the standard
    "no dangling redistribution" variant; redistribute via a scalar agg
    + broadcast if mass conservation matters. Ties and totals are exact:
    the result is invariant to partitioning and summation order, which
    is what lets the DuckDB oracle hash-match it.
    """
    base = (scale * (damp_den - damp_num)) // damp_den
    if prepartition:
        # localCheckpoint, NOT persist(): CacheManager retains a persisted
        # plan until an explicit unpersist, so repeated calls in a long-
        # lived session would pin one cached edge table per call (the
        # ADVICE-r3 leak fixed in linking.py). Checkpointed blocks are
        # released by the ContextCleaner once the returned plan is GC'd,
        # and the lineage cut serves the same reuse-across-iterations goal.
        edges = edges.repartition(prepartition, "src").localCheckpoint(eager=False)
    out_d = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("out_degree")
    )
    nodes = graph_nodes(edges)
    ranks = nodes.select("node", F.lit(scale).cast("long").alias("rank"))
    for i in range(iterations):
        contribs = (
            ranks.join(out_d, "node")
            .select(
                "node",
                F.expr(f"(rank * {damp_num}) div (out_degree * {damp_den})").alias("c"),
            )
            .join(edges.select(F.col("src").alias("node"), "dst"), "node")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("c").alias("in_mass"))
        )
        ranks = nodes.join(contribs, "node", "left").select(
            "node",
            (F.lit(base) + F.coalesce("in_mass", F.lit(0))).cast("long").alias("rank"),
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def hits_fixedpoint(
    edges: DataFrame,
    iterations: int = 2,
    scale: int = SCALE,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Fixed-point integer HITS: (node, auth, hub) after ``iterations``
    rounds, each value normalized so the per-step maximum equals
    ``scale`` (max-normalization keeps everything in BIGINT — the L2
    norm of the textbook formulation needs sqrt and can never be
    engine-exact).

        hub_0        = scale everywhere
        auth_i(v)    = (sum over in-edges of hub_{i-1}(u)) * scale
                       div max-over-v(that sum)
        hub_i(u)     = (sum over out-edges of auth_i(v)) * scale
                       div max-over-u(that sum)

    The normalizer is a one-row aggregate broadcast back (crossJoin of
    a 1-row frame — no driver action, no collect). Bound: the raw sum
    times scale must stay under 2^63, i.e. max weighted degree below
    ~9.2e12/scale; pass a smaller scale for hub-ier graphs. Exact under
    any partitioning — the DuckDB oracle unrolls the same chain.

    Each round adds two joins + two broadcast normalizations to the
    plan, so (like ``pagerank_fixedpoint``) lineage is truncated every
    ``checkpoint_every`` rounds — without it a 20-iteration run hands
    Catalyst an exponentially deep plan."""
    if iterations < 1:
        raise ValueError(
            f"hits_fixedpoint needs iterations >= 1 (got {iterations}): the "
            "two-phase auth/hub update defines no round-0 auth score"
        )
    nodes = graph_nodes(edges)
    hubs = nodes.select("node", F.lit(scale).cast("long").alias("hub"))
    auth = None
    for i in range(iterations):
        araw = (
            edges.join(hubs.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("hub").alias("raw"))
        )
        am = araw.agg(F.max("raw").alias("m"))
        auth = araw.crossJoin(F.broadcast(am)).select(
            "node", F.expr(f"(raw * {scale}) div m").alias("auth")
        )
        hraw = (
            edges.join(auth.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("auth").alias("raw"))
        )
        hm = hraw.agg(F.max("raw").alias("m"))
        hubs = hraw.crossJoin(F.broadcast(hm)).select(
            "node", F.expr(f"(raw * {scale}) div m").alias("hub")
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            auth = auth.localCheckpoint(eager=False)
            hubs = hubs.localCheckpoint(eager=False)
    return (
        nodes.join(auth, "node", "left")
        .join(hubs, "node", "left")
        .select(
            "node",
            F.coalesce("auth", F.lit(0)).cast("long").alias("auth"),
            F.coalesce("hub", F.lit(0)).cast("long").alias("hub"),
        )
    )


def undirected_edges(edges: DataFrame) -> DataFrame:
    """Canonical undirected edge set: (a, b) with a < b, self-loops
    dropped, duplicates collapsed."""
    a = F.least("src", "dst").alias("a")
    b = F.greatest("src", "dst").alias("b")
    return edges.select(a, b).filter(F.col("a") != F.col("b")).distinct()


def triangle_count(edges: DataFrame) -> DataFrame:
    """Global triangle count of the undirected graph — one row
    (n_triangles). Canonical a<b<c enumeration: join wedge (a,b)+(b,c)
    then close with (a,c); each triangle matches exactly once. At web
    scale the wedge join is the expensive step — it shuffles on the
    shared vertex, so cap or salt super-hub vertices first (the same
    head-cap used for domains); left as the caller's curation step."""
    e = undirected_edges(edges)
    e1 = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = e.select(F.col("a").alias("y"), F.col("b").alias("z"))
    wedges = e1.join(e2, "y").filter(F.col("x") < F.col("z"))
    closed = wedges.join(
        e.select(F.col("a").alias("x"), F.col("b").alias("z")), ["x", "z"]
    )
    return closed.agg(F.count(F.lit(1)).alias("n_triangles"))


def two_hop_counts(edges: DataFrame) -> DataFrame:
    """(node, n_two_hop): number of DISTINCT nodes reachable in exactly
    two directed hops (intermediate and endpoints may coincide with the
    start — pure path semantics, matching the SQL oracle). One self-join
    on the middle vertex + a distinct aggregate."""
    e1 = edges.select(F.col("src").alias("node"), F.col("dst").alias("mid"))
    e2 = edges.select(F.col("src").alias("mid"), F.col("dst").alias("far"))
    return (
        e1.join(e2, "mid")
        .groupBy("node")
        .agg(F.countDistinct("far").alias("n_two_hop"))
    )
