"""Distributed graph operators for corpus-quality signals.

Web-scale training corpora rank pages by link-graph centrality before
sampling (Common Crawl releases harmonic-centrality / PageRank ranks
precisely for this). This module implements PageRank as the classic
Pregel-style Spark plan — one join + one aggregation per iteration —
in **fixed-point integer arithmetic** so results are bit-exact and
reproducible across engines (no float-summation-order drift between
runs, executors, or the DuckDB correctness oracle).

Scale notes (100 TB / web-graph sized inputs):
- The edge table is the big operand; it is joined once per iteration
  against the (nodes-sized) rank table on ``src``.  Out-degrees are
  pre-joined ONCE outside the loop and the resulting
  ``(src, dst, outdeg)`` table is cached, so each iteration pays a
  single shuffle keyed on ``dst`` for the contribution aggregation —
  rank tables are nodes-sized, edges never re-shuffled at width.
- Each iteration's rank frame is ``localCheckpoint``-ed (eager) so
  lineage stays flat; K iterations = K linear jobs, same discipline
  as ``ops/dedup.connected_components`` (reference for the pattern:
  min-label propagation, 1 job/round).
- Dangling nodes (no out-edges) simply contribute nothing; mass lost
  to them is NOT redistributed (the "weak" PageRank variant) — this
  keeps the plan one-join-per-iteration and is the variant used by
  most web-graph pipelines; the docunit tests pin the semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank", "triangle_counts", "hits"]


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping_milli: int = 850,
    scale: int = 10**9,
    seeds: DataFrame | None = None,
) -> DataFrame:
    """Fixed-point PageRank over a directed edge list.

    Parameters
    ----------
    edges : DataFrame with string columns ``src``, ``dst``.
        Duplicate edges are collapsed (classic unweighted PageRank).
    iterations : number of power-iteration rounds (unrolled jobs).
    damping_milli : damping factor in thousandths (850 = 0.85).
    scale : fixed-point denominator; ranks are integers out of
        ``scale`` (1e9 ≈ nano-precision, exact in 64-bit for any
        realistic node count).

    Returns ``(node string, rank_fp long)`` where ``rank_fp`` is the
    rank scaled by ``scale`` and floor-divided at every step — the
    arithmetic is integer-exact, so two runs (or two engines) agree
    bit-for-bit.

    Update rule per node v::

        r'(v) = ((1000 - d) * scale) // (1000 * N)
                + (d * SUM over in-edges(u,v) of r(u) // outdeg(u)) // 1000

    All divisions are floor divisions on integers.

    ``seeds`` (optional, a one-column node DataFrame) switches to
    PERSONALIZED PageRank: initial mass and the teleport term
    concentrate on the seed set (``N`` → ``|S ∩ nodes|``; non-seeds
    get teleport 0) — relevance-to-the-seeds instead of global
    centrality, the standard "rank pages near these trusted domains"
    signal. Seeds outside the graph are ignored; the seed flag rides
    the cached node table, so the per-iteration plan is unchanged.
    """
    if iterations < 0:
        raise ValueError("iterations must be >= 0")
    e = edges.select("src", "dst").distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    # Pre-join out-degrees once; this (src, dst, outdeg) table is the
    # loop-invariant big operand — cache it so K iterations scan it
    # from memory/disk instead of recomputing the distinct + join.
    ed = e.join(outdeg, "src").persist()
    if seeds is not None:
        sd = (
            seeds.select(F.col(seeds.columns[0]).alias("node"))
            .distinct()
            .withColumn("__seed", F.lit(1))
        )
        nodes = nodes.join(sd, "node", "left").select(
            "node", F.coalesce(F.col("__seed"), F.lit(0)).alias("__seed")
        )
    else:
        nodes = nodes.withColumn("__seed", F.lit(1))
    nodes = nodes.persist()  # scanned once per iteration
    n_nodes = nodes.count()  # driver scalar; also materializes `nodes`
    n_mass = (
        n_nodes
        if seeds is None
        else nodes.filter(F.col("__seed") == 1).count()
    )
    if n_nodes == 0:
        return nodes.select(
            "node", F.lit(0).cast("long").alias("rank_fp")
        )
    if n_mass == 0:
        raise ValueError("no seed node appears in the graph")
    teleport = ((1000 - damping_milli) * scale) // (1000 * n_mass)
    tele_expr = F.col("__seed").cast("long") * F.lit(teleport)
    ranks = nodes.select(
        "node",
        (F.col("__seed").cast("long") * F.lit(scale // n_mass)).alias(
            "rank_fp"
        ),
    )
    for _ in range(iterations):
        contrib = (
            ed.join(ranks, ed.src == ranks.node)
            .select(
                ed.dst.alias("node"),
                # `div` = exact integral division on longs; a double
                # divide + floor could misround when outdeg is huge
                # (quotient within 1 ulp of an integer).
                F.expr("rank_fp div outdeg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("csum"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    tele_expr
                    + F.expr(
                        f"(CAST({damping_milli} AS BIGINT)"
                        " * coalesce(csum, CAST(0 AS BIGINT)))"
                        " div CAST(1000 AS BIGINT)"
                    )
                ).cast("long").alias("rank_fp"),
            )
            .localCheckpoint(eager=True)  # flat lineage: 1 job/round
        )
    ed.unpersist()
    if iterations > 0:  # checkpointed ranks no longer need the cache
        nodes.unpersist()
    return ranks


def triangle_counts(
    edges: DataFrame, src_col: str = "id_a", dst_col: str = "id_b"
) -> DataFrame:
    """Per-node triangle counts — the clustering signal behind
    community/spam detection on link graphs (a page whose neighbors
    interlink is structurally different from a link farm). Returns
    (node, n_triangles); nodes in no triangle are omitted.

    Scale shape: the classic degree-ordered node-iterator. Every edge
    is oriented from its LOWER-(degree, id) endpoint to the higher
    one — a total order, so each triangle is generated exactly once:
    as a wedge at its minimum-rank corner plus one closing-edge
    lookup. Orientation bounds the wedge join's fan-out by the SMALL
    endpoint's degree (Σ min-degree² ≪ Σ degree² on power-law
    graphs — the hub that would explode a naive wedge join only ever
    appears as a wedge TARGET, never the pivot). Joins shuffle on
    node / edge keys only; degrees are a nodes-sized table."""
    und = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        und.select(F.col("a").alias("n"))
        .unionByName(und.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # orient by (degree, id) rank: lower endpoint -> higher endpoint
    ranked = (
        und.join(deg.withColumnRenamed("n", "a").withColumnRenamed("d", "da"), "a")
        .join(deg.withColumnRenamed("n", "b").withColumnRenamed("d", "db"), "b")
    )
    fwd = ranked.filter(
        (F.col("da") < F.col("db"))
        | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b")))
    ).select(
        F.col("a").alias("src"),
        F.col("b").alias("dst"),
        F.col("db").alias("rd"),
    )
    rev = ranked.filter(
        (F.col("db") < F.col("da"))
        | ((F.col("da") == F.col("db")) & (F.col("b") < F.col("a")))
    ).select(
        F.col("b").alias("src"),
        F.col("a").alias("dst"),
        F.col("da").alias("rd"),
    )
    oriented = fwd.unionByName(rev).localCheckpoint(eager=True)
    e1 = oriented.select(
        F.col("src"), F.col("dst").alias("v"), F.col("rd").alias("rv")
    )
    e2 = oriented.select(
        F.col("src"), F.col("dst").alias("w"), F.col("rd").alias("rw")
    )
    wedges = e1.join(e2, on="src").filter(
        (F.col("rv") < F.col("rw"))
        | ((F.col("rv") == F.col("rw")) & (F.col("v") < F.col("w")))
    )
    closing = oriented.select(
        F.col("src").alias("v"), F.col("dst").alias("w")
    )
    tris = wedges.join(closing, on=["v", "w"]).select(
        F.col("src").alias("x"), "v", "w"
    )
    member = (
        tris.select(F.col("x").alias("node"))
        .unionByName(tris.select(F.col("v").alias("node")))
        .unionByName(tris.select(F.col("w").alias("node")))
    )
    return member.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )


def hits(
    edges: DataFrame,
    iterations: int = 3,
    scale: int = 10**9,
) -> DataFrame:
    """Fixed-point HITS (Kleinberg hubs & authorities) over a directed
    edge list — the link-analysis twin of :func:`pagerank`: a good HUB
    points at good authorities, a good AUTHORITY is pointed at by good
    hubs. The curation use is bipartite quality transfer (domains <->
    documents, users <-> items).

    Same determinism discipline as :func:`pagerank`: every quantity is
    an INTEGER out of ``scale``; each half-step sums the opposite
    score over edges and renormalizes by the round's total with floor
    division (``x_fp = (x_raw * scale) div sum(x_raw)``, products in
    decimal(38,0) so count*scale can never overflow) — so two runs or
    two engines agree bit-for-bit, and the unrolled SQL oracle can
    replay it.

    Scale shape: per iteration, two equi-join + partial-agg shuffles
    over the cached distinct edge table, each materialized ONCE (the
    checkpointed raw-sum frame feeds both the one-row total and the
    renormalized score — the earlier shape re-ran the edge join inside
    the broadcast total's subtree, doubling the per-round edge joins);
    the round total is an integer-exact one-row collect folded in as a
    literal. Score frames are re-derived from the checkpointed raws
    (nodes-sized joins), so lineage stays flat without per-score
    checkpoints. Returns ``(node string, hub_fp long, auth_fp long)``
    — nodes with no outgoing (incoming) edges hold hub (authority) 0.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    e = edges.select("src", "dst").distinct().persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    dec = "decimal(38,0)"
    hub = nodes.select("node", F.lit(int(scale)).cast("long").alias("hub_fp"))
    auth = None
    for _ in range(iterations):
        a_raw = (
            e.join(hub, e.src == hub.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("hub_fp").alias("__raw"))
            .localCheckpoint(eager=True)  # edge join runs exactly once
        )
        a_tot = a_raw.agg(F.sum("__raw").alias("__tot")).collect()[0]["__tot"]
        auth = nodes.join(a_raw, "node", "left").select(
            "node",
            F.expr(
                f"CAST(coalesce(__raw, 0) AS {dec}) * {int(scale)} "
                f"div CAST({a_tot if a_tot is not None else 'NULL'} AS {dec})"
            ).cast("long").alias("auth_fp"),
        )
        h_raw = (
            e.join(auth, e.dst == auth.node)
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("auth_fp").alias("__raw"))
            .localCheckpoint(eager=True)  # flat lineage: 2 jobs/round
        )
        h_tot = h_raw.agg(F.sum("__raw").alias("__tot")).collect()[0]["__tot"]
        hub = nodes.join(h_raw, "node", "left").select(
            "node",
            F.expr(
                f"CAST(coalesce(__raw, 0) AS {dec}) * {int(scale)} "
                f"div CAST({h_tot if h_tot is not None else 'NULL'} AS {dec})"
            ).cast("long").alias("hub_fp"),
        )
    out = (
        nodes.join(hub, "node", "left")
        .join(auth, "node", "left")
        .select(
            "node",
            F.coalesce("hub_fp", F.lit(0)).cast("long").alias("hub_fp"),
            F.coalesce("auth_fp", F.lit(0)).cast("long").alias("auth_fp"),
        )
        .localCheckpoint(eager=True)
    )
    e.unpersist()
    nodes.unpersist()  # checkpointed raws no longer need the caches
    return out
