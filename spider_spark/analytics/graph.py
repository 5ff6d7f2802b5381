"""Link-graph analytics over the interleaved crawl corpus.

The reference indexes pages but never analyses the link structure it
discovers (Spider.java:653-657 only queues ``foundURI`` targets); a
web-scale crawl pipeline, however, ranks its frontier by link analysis
and audits reachability from the seed set.  These are the two classic
operators:

  * :func:`pagerank` — damped power iteration over an edge list
    (Page et al. 1999, "The PageRank Citation Ranking", public paper).
  * :func:`bfs_depths` — minimum hop distance from a seed set
    (crawl-depth audit: which pages are reachable in <= K rounds).

Both are expressed as iterative DataFrame joins — the idiomatic Spark
shape for fixed-iteration graph algorithms (the same join+groupBy
round GraphX's Pregel runs under the hood).  Scale notes:

  * Edges are partition-key joined each iteration: callers at real
    scale should ``repartition(src)`` + persist the edge list ONCE so
    every iteration reuses the same shuffle-free build side.
  * Rank/depth frames stay tiny relative to edges (one row per node);
    the per-iteration shuffle is the groupBy on ``dst`` — unavoidable
    and map-side combined.
  * Lineage grows linearly with iterations; for >~20 iterations
    callers should ``localCheckpoint()`` the rank frame periodically.
    At the fixed small iteration counts used by the driver queries the
    linear plan is cheaper than checkpoint I/O.
  * Dangling mass is redistributed via a broadcast 1-row cross join —
    no ``collect()`` per iteration, the loop stays fully lazy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    *,
    iterations: int = 5,
    damping: float = 0.85,
    checkpoint_every: int = 0,
    n_nodes: int | None = None,
    assume_no_dangling: bool = False,
    assume_unique_nodes: bool = False,
) -> DataFrame:
    """Damped PageRank over ``edges(src, dst)`` (parallel edges count
    as repeated endorsements, matching the random-surfer model).

    Returns ``(node, rank)`` where ranks sum to 1.  ``nodes`` widens
    the vertex set beyond edge endpoints (isolated pages keep the
    teleport mass); default is the union of endpoints.  Dangling nodes
    (no outlinks) redistribute their mass uniformly each iteration.

    ``checkpoint_every > 0`` truncates lineage with ``localCheckpoint``
    every that-many iterations — off by default for short loops.
    ``n_nodes`` lets a caller that already knows the vertex count
    (e.g. a parquet footer row count) skip the counting job.
    ``assume_no_dangling=True`` drops the per-iteration dangling-mass
    branch (an anti-join + broadcast cross join) when the caller can
    prove every node has outlinks — e.g. the interleaved corpus, where
    every doc emits exactly 3 media spans.
    """
    e = edges.select(F.col("src").cast("string").alias("src"),
                     F.col("dst").cast("string").alias("dst"))
    if nodes is None:
        nodes = e.select(F.col("src").alias("node")).union(
            e.select(F.col("dst").alias("node"))).distinct()
    else:
        # assume_unique_nodes=True skips the dedup shuffle when the
        # caller's frame is one row per node by construction (e.g. a
        # projection of a primary-key column)
        nodes = nodes.select(F.col(nodes.columns[0]).cast("string")
                             .alias("node"))
        if not assume_unique_nodes:
            nodes = nodes.distinct()
    nodes = nodes.cache()
    if n_nodes is None:
        n_nodes = nodes.count()  # one job; the scalar parameterizes the plan
    if n_nodes == 0:
        empty = nodes.select("node", F.lit(0.0).alias("rank"))
        nodes.unpersist()
        return empty

    # out-degree per source, joined once onto the edge list so each
    # iteration ships (src, dst, out_deg) without re-aggregating
    deg = e.groupBy("src").agg(F.count("*").alias("out_deg"))
    # cache fills during the first stage that computes it and is
    # reused by all later iterations within the same action — no
    # eager count() job needed to warm it
    ee = e.join(deg, "src").cache()

    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    teleport = (1.0 - damping) / n_nodes
    for it in range(iterations):
        contrib = (
            ee.join(ranks, ee["src"] == ranks["node"])
            .select("dst", (F.col("rank") / F.col("out_deg")).alias("c"))
            .groupBy("dst").agg(F.sum("c").alias("in_rank"))
        )
        base = nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
        if assume_no_dangling:
            ranks = base.select(
                "node",
                (F.lit(teleport)
                 + F.lit(damping)
                 * F.coalesce(F.col("in_rank"), F.lit(0.0))).alias("rank"),
            )
        else:
            # dangling mass: rank held by nodes with no outlinks, spread
            # uniformly — broadcast scalar, no driver collect
            dangling = (
                ranks.join(deg, ranks["node"] == deg["src"], "left_anti")
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm"))
            )
            ranks = base.crossJoin(F.broadcast(dangling)).select(
                "node",
                (F.lit(teleport)
                 + F.lit(damping)
                 * (F.coalesce(F.col("in_rank"), F.lit(0.0))
                    + F.col("_dm") / n_nodes)).alias("rank"),
            )
        if checkpoint_every and (it + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint()
    # materialize the (one-row-per-node) result so the big cached
    # build sides can be released here instead of leaking into the
    # caller's session (blocks of the checkpointed frame are freed by
    # the ContextCleaner when the caller drops the DataFrame)
    ranks = ranks.localCheckpoint()
    ee.unpersist()
    nodes.unpersist()
    return ranks


def bfs_depths(edges: DataFrame, sources: DataFrame,
               *, max_depth: int = 4) -> DataFrame:
    """Minimum hop distance from ``sources`` along ``edges(src, dst)``,
    exact for depths <= ``max_depth`` (Bellman-Ford layering: after K
    propagation rounds every node within K hops carries its true BFS
    depth).  Returns ``(node, depth)`` for reached nodes only.

    Integer output — bit-stable across engines, no float rounding.
    """
    e = edges.select(F.col("src").cast("string").alias("src"),
                     F.col("dst").cast("string").alias("dst")).cache()
    depths = sources.select(
        F.col(sources.columns[0]).cast("string").alias("node"),
        F.lit(0).cast("int").alias("depth"),
    ).distinct()
    for _ in range(max_depth):
        step = (
            e.join(depths, e["src"] == depths["node"])
            .select(F.col("dst").alias("node"),
                    (F.col("depth") + F.lit(1)).cast("int").alias("depth"))
        )
        depths = (
            depths.unionByName(step)
            .groupBy("node").agg(F.min("depth").cast("int").alias("depth"))
            # depths feeds BOTH branches of the next iteration (union +
            # join), so uncut lineage doubles per round (2^K leaves);
            # materializing the node-sized frame each round keeps the
            # plan linear — the standard iterative-graph trade
            .localCheckpoint()
        )
    # release the cached edge list (see pagerank: the cache must not
    # outlive the call; depths is already checkpointed)
    e.unpersist()
    return depths


def hits(edges: DataFrame, *, iterations: int = 2) -> DataFrame:
    """Kleinberg's HITS hubs-and-authorities scores (JACM 46(5), 1999,
    "Authoritative sources in a hyperlinked environment") over
    ``edges(src, dst)`` with unit edge weights.  Returns
    ``(node, auth, hub)`` max-normalized to [0, 1].

    The power iteration runs UNNORMALIZED: with hub⁰ ≡ 1 every
    intermediate score is an exact small integer (auth¹ is the
    in-degree, hub¹ the sum of successor in-degrees, …), so the
    per-node double sums are exact and partition-order independent —
    bit-identical across engines and cluster layouts.  Normalization
    is linear, so deferring it to one final division by the max (an
    order-independent reduction) yields the same direction as the
    textbook per-iteration rescale.  Integer headroom in doubles is
    2^53; magnitudes grow like (mean degree)^(2·iterations), far
    below that for any realistic iteration count.

    Scale notes: identical shuffle shape to :func:`pagerank` — two
    map-side-combined groupBys per iteration (on ``dst`` then
    ``src``); the edge list is cached once and released before
    returning, and the score frames stay one-row-per-node.
    """
    e = edges.select(F.col("src").cast("string").alias("src"),
                     F.col("dst").cast("string").alias("dst")).cache()
    # nodes is a shuffle-distinct reused by every per-iteration left
    # join — uncached it re-runs per join and the plan tree grows
    # quadratically with iterations (bench: 7.6s -> pagerank-class)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .cache()
    )
    hub = nodes.select("node", F.lit(1.0).alias("hub"))
    # iterations=0 degenerates to the uniform baseline (hub ≡ 1,
    # auth ≡ 0) instead of crashing on a None frame
    auth = nodes.select("node", F.lit(0.0).alias("auth"))
    for _ in range(iterations):
        in_sum = (
            e.join(hub, e["src"] == hub["node"])
            .groupBy("dst").agg(F.sum("hub").alias("_v"))
        )
        auth = (
            nodes.join(in_sum, nodes["node"] == in_sum["dst"], "left")
            .select("node", F.coalesce("_v", F.lit(0.0)).alias("auth"))
        )
        out_sum = (
            e.join(auth, e["dst"] == auth["node"])
            .groupBy("src").agg(F.sum("auth").alias("_v"))
        )
        hub = (
            nodes.join(out_sum, nodes["node"] == out_sum["src"], "left")
            .select("node", F.coalesce("_v", F.lit(0.0)).alias("hub"))
        )
    # materialize the final auth⋈hub ONCE (eager localCheckpoint) so
    # the max-norm aggregation and the output projection both read the
    # checkpointed rows instead of each re-evaluating the iteration
    # chain end-to-end
    scores = auth.join(hub, "node").localCheckpoint()
    # max is 0 only on an empty edge list (all scores 0); guard keeps
    # the division defined and both engines agree on the all-zero output
    norms = scores.agg(
        F.greatest(F.max("auth"), F.lit(1.0)).alias("_ma"),
        F.greatest(F.max("hub"), F.lit(1.0)).alias("_mh"),
    )
    out = (
        scores.crossJoin(F.broadcast(norms))
        .select("node",
                (F.col("auth") / F.col("_ma")).alias("auth"),
                (F.col("hub") / F.col("_mh")).alias("hub"))
    )
    e.unpersist()
    nodes.unpersist()
    return out


def opic(edges: DataFrame, *, iterations: int = 3,
         cash0: float = 1.0, nodes: DataFrame | None = None,
         assume_unique_nodes: bool = False) -> DataFrame:
    """OPIC — On-line Page Importance Computation (Abiteboul, Preda,
    Cobena, WWW 2003, "Adaptive On-Line Page Importance Computation")
    in its synchronous batch form: every node starts with ``cash0``
    cash; each step a node banks its cash into ``history`` and
    distributes it equally over its out-edges.  Importance after k
    steps is proportional to ``history + cash``.  This is the frontier
    prioritizer Nutch popularized — unlike pagerank it needs no
    convergence loop, any prefix of the iteration is a usable ranking.

    Returns ``(node, history, cash)`` after ``iterations`` steps.
    Callers wanting exact cross-engine parity on a constant-out-degree
    d graph should pass ``cash0 = d ** iterations``: every division
    then yields an exact integer-valued double, so per-node sums are
    order-independent and bit-identical across engines and partition
    layouts (integer headroom 2^53 — see :func:`hits`).

    Dangling nodes (no out-edges) bank their cash but distribute
    nothing — their outflow evaporates instead of routing to OPIC's
    virtual node; on crawl-frontier graphs the virtual node's only
    role is bootstrapping unreached pages, which the caller's seed
    logic already owns.

    Scale notes: same shuffle shape as :func:`pagerank` — the edge
    list (augmented once with out-degrees) is cached and reused every
    iteration; one map-side-combined groupBy on ``dst`` per step; the
    cash/history frames stay one row per node.
    """
    e = edges.select(F.col("src").cast("string").alias("src"),
                     F.col("dst").cast("string").alias("dst"))
    od = e.groupBy("src").agg(F.count("*").alias("_od"))
    e = e.join(od, "src").cache()
    if nodes is None:
        nodes = e.select(F.col("src").alias("node")).union(
            e.select(F.col("dst").alias("node"))).distinct()
    else:
        # caller-supplied vertex frame (must cover every endpoint);
        # assume_unique_nodes=True skips the dedup shuffle when the
        # caller's frame is one row per node by construction — same
        # contract as pagerank's flag (duplicate rows would silently
        # double a node's cash, so dedup is the default)
        nodes = nodes.select(
            F.col(nodes.columns[0]).cast("string").alias("node"))
        if not assume_unique_nodes:
            nodes = nodes.distinct()
    nodes = nodes.cache()
    cash = nodes.select("node", F.lit(float(cash0)).alias("cash"))
    hist = nodes.select("node", F.lit(0.0).alias("history"))
    for _ in range(iterations):
        inflow = (
            e.join(cash, e["src"] == cash["node"])
            .groupBy("dst")
            .agg(F.sum(F.col("cash") / F.col("_od")).alias("_v"))
        )
        hist = (
            hist.join(cash, "node")
            .select("node", (F.col("history") + F.col("cash")).alias("history"))
        )
        cash = (
            nodes.join(inflow, nodes["node"] == inflow["dst"], "left")
            .select("node", F.coalesce("_v", F.lit(0.0)).alias("cash"))
        )
    out = hist.join(cash, "node").localCheckpoint()
    e.unpersist()
    nodes.unpersist()
    return out


def trustrank(
    edges: DataFrame,
    seeds: DataFrame,
    *,
    iterations: int = 3,
    damping: float = 0.85,
    n_seeds: int | None = None,
    nodes: DataFrame | None = None,
    assume_unique: bool = False,
) -> DataFrame:
    """TrustRank (Gyöngyi, Garcia-Molina, Pedersen, VLDB 2004):
    personalized PageRank whose teleport mass lands ONLY on a trusted
    seed set — trust flows out from hand-vetted pages and decays with
    link distance, so low-trust frontier URLs are demoted before
    fetch.  The spam-control prioritizer next to :func:`pagerank`
    (global importance) and :func:`opic` (online importance).

    ``seeds``: one-column frame of trusted node ids.  Seed ids absent
    from the node set are DROPPED (the left join keeps node-frame rows
    only) and do not count toward the teleport denominator when
    ``n_seeds`` is left to the internal count; pass only real nodes.
    ``t0 = d``, ``t_{k+1} = (1-α)·d + α·Mᵀt_k`` with ``d`` uniform
    over seeds.  ``assume_unique=True`` skips the dedup shuffles on
    BOTH the seed frame and a caller-supplied ``nodes`` frame (same
    contract as pagerank's ``assume_unique_nodes``).

    Dangling mass is NOT redistributed (the VLDB-04 formulation drops
    it); on the interleaved corpus graph every node has out-edges so
    nothing evaporates.

    Scale notes: identical shuffle shape to :func:`pagerank` — edge
    list cached once with out-degrees, one map-side-combined groupBy
    on ``dst`` per iteration, trust frame one row per node; the seed
    flag rides the node frame (no per-iteration re-filter)."""
    e = edges.select(F.col("src").cast("string").alias("src"),
                     F.col("dst").cast("string").alias("dst"))
    od = e.groupBy("src").agg(F.count("*").alias("_od"))
    e = e.join(od, "src").cache()
    s = seeds.select(
        F.col(seeds.columns[0]).cast("string").alias("node"),
        F.lit(True).alias("_seed"),
    )
    if not assume_unique:
        s = s.distinct()
    if nodes is None:
        nodes = e.select(F.col("src").alias("node")).union(
            e.select(F.col("dst").alias("node"))).distinct()
    else:
        # caller-supplied vertex frame covering every endpoint; dedup
        # unless assume_unique (duplicate rows would silently double a
        # node's teleport mass and output rows)
        nodes = nodes.select(
            F.col(nodes.columns[0]).cast("string").alias("node"))
        if not assume_unique:
            nodes = nodes.distinct()
    nodes = (
        nodes.join(s, "node", "left")
        .select("node", F.coalesce("_seed", F.lit(False)).alias("_seed"))
        .cache()
    )
    if n_seeds is None:
        n_seeds = nodes.filter("_seed").count()
    if n_seeds == 0:
        out = nodes.select("node", F.lit(0.0).alias("trust"))
        e.unpersist()
        nodes.unpersist()
        return out
    d0 = 1.0 / n_seeds
    trust = nodes.select(
        "node", "_seed",
        F.when(F.col("_seed"), F.lit(d0)).otherwise(0.0).alias("trust"))
    teleport = (1.0 - damping) * d0
    for _ in range(iterations):
        inflow = (
            e.join(trust, e["src"] == trust["node"])
            .groupBy("dst")
            .agg(F.sum(F.col("trust") / F.col("_od")).alias("_v"))
        )
        trust = (
            nodes.join(inflow, nodes["node"] == inflow["dst"], "left")
            .select(
                "node", "_seed",
                (F.when(F.col("_seed"), F.lit(teleport)).otherwise(0.0)
                 + F.lit(damping) * F.coalesce("_v", F.lit(0.0)))
                .alias("trust"),
            )
        )
    out = trust.select("node", "trust").localCheckpoint()
    e.unpersist()
    nodes.unpersist()
    return out
