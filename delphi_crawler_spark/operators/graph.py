"""Graph operators: connected components and link-rank (PageRank).

Two iterative graph primitives a web-scale corpus pipeline needs that the
DataFrame API lacks:

- **Connected components** close the near-dup loop. The dedup family
  (``dedup_fuzzy``) emits verified duplicate *pairs*; turning pairs into
  dedup decisions needs the transitive closure — if A~B and B~C, all three
  are one cluster even when A~C was never emitted. ``minhash_dedup``'s
  1-hop min-id collapse is exact only when clusters are cliques;
  ``connected_components`` is exact for any pair set. The implementation
  is the alternating large-star/small-star algorithm (Kiveris et al.,
  "Connected Components in MapReduce and Beyond", SoCC 2014): each
  iteration is two keyed aggregations + equi-joins (no cartesian
  products), the edge set only shrinks toward a star per component, and
  convergence is O(log^2 n) rounds — at 10^10 nodes that is ~15 rounds of
  hash-partitioned shuffles, each O(|E|). Per-iteration results are
  persisted and lineage is truncated (``localCheckpoint``; on a real
  cluster point ``spark.sparkContext.setCheckpointDir`` at durable storage
  and flip ``reliable_checkpoint=True``) so the plan does not grow with
  the iteration count.

- **Link rank** (PageRank, Brin & Page 1998) gives the crawl scheduler a
  principled priority: hosts/URLs that many other hosts point at get
  fetched (and refreshed — see ``recrawl.inlink_priority_refresh`` for the
  cheap in-degree variant) first. Fixed-iteration damped power method over
  a weighted edge list: ranks live in a (node, rank) DataFrame, each
  iteration is one shuffle join on the source key plus one keyed sum —
  contributions partially aggregate map-side, and the edge list is
  pre-partitioned by source so only the (small) rank table moves.
  Dangling-node mass is redistributed uniformly each iteration so total
  rank stays 1 and results match the textbook formulation.

The reference engine schedules identifier batches FIFO
(IndexProcessing.scala:76-99) and has no graph analytics; these extend the
priority family (SURVEY.md §2.3 P6, §2.10) the way a production crawler
(and any training-data curation pipeline doing cluster-level dedup)
needs.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "connected_components",
    "neardup_clusters",
    "link_rank",
    "hits",
    "neighborhood_function",
    "hyperanf_neighborhood",
]


def _fingerprint(edges: DataFrame) -> tuple[int, int]:
    """(count, order-independent hash-sum) of an edge set — cheap stable
    identity for the convergence check, one aggregate action."""
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        # decimal(38,0) sum: order-independent and cannot overflow under
        # ANSI mode (126-bit headroom over the 64-bit hash values)
        F.coalesce(
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")), F.lit(0)
        ).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node u: m = min(N(u) ∪ {u}); connect every strictly-larger
    neighbor to m. Keyed agg + same-key join — one shuffle on u."""
    nbrs = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = (
        nbrs.groupBy("u")
        .agg(F.min("v").alias("_mn"))
        .select("u", F.least(F.col("_mn"), F.col("u")).alias("m"))
    )
    # no distinct here: duplicates cannot change any min and the following
    # small-star pass dedupes; dropping it saves one shuffle per iteration
    return (
        nbrs.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges larger→smaller, then for each node u connect u and all
    its (smaller) neighbors to m = min(N(u) ∪ {u})."""
    oriented = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    mins = (
        oriented.groupBy("u")
        .agg(F.min("v").alias("m"))  # all v < u here, so min(N(u) ∪ {u}) = min(v)
    )
    out = (
        oriented.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .union(mins.select(F.col("u"), F.col("m").alias("v")))
    )
    return out.where(F.col("u") != F.col("v")).distinct()


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    reliable_checkpoint: bool = False,
) -> DataFrame:
    """Connected components of the undirected graph given as an edge list.

    Returns (node, component) for every node that appears in ``edges``,
    where ``component`` is the smallest node id in its component (node ids
    must be orderable; bigint in practice). Singleton nodes never seen in
    an edge are absent — callers left-join and ``coalesce`` to the node's
    own id (see ``neardup_clusters``).

    Alternating large-star/small-star with a fingerprint convergence test;
    terminates when the edge set is a fixed point (a star forest), at most
    ``max_iter`` rounds (a guard — O(log^2 n) suffices in theory and
    single digits in practice for near-dup graphs).
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .persist()
    )
    fp = _fingerprint(e)
    converged = False
    for _ in range(max_iter):
        nxt = _small_star(_large_star(e))
        if reliable_checkpoint:
            nxt = nxt.checkpoint(eager=True)
        else:
            nxt = nxt.localCheckpoint(eager=True)
        nfp = _fingerprint(nxt)
        e.unpersist()
        e = nxt
        if nfp == fp:
            converged = True
            break
        fp = nfp
    if not converged:
        # the star-forest extraction below is only valid at the fixed
        # point — wrong components must be loud, never silent
        e.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} iterations"
        )
    # e is now a star forest: (child, root). Roots appear only on the right.
    roots = e.select(F.col("v").alias("node")).distinct().select(
        "node", F.col("node").alias("component")
    )
    comps = e.select(F.col("u").alias("node"), F.col("v").alias("component")).union(
        roots
    )
    out = comps.distinct()
    e.unpersist()
    return out


def neardup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Cluster documents by verified near-dup pairs: transitive closure of
    the pair graph, singletons as their own cluster, canonical = smallest
    id per cluster (the survivor a dedup pass would keep).

    Returns docs' columns plus ``cluster_id``, ``cluster_size``,
    ``is_canonical``. Exactly one canonical row per cluster.
    """
    comps = connected_components(pairs, src=id_a, dst=id_b, max_iter=max_iter)
    labeled = (
        docs.join(comps.withColumnRenamed("node", id_col), id_col, "left")
        .withColumn("cluster_id", F.coalesce(F.col("component"), F.col(id_col)))
        .drop("component")
    )
    sizes = labeled.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return labeled.join(sizes, "cluster_id").withColumn(
        "is_canonical", F.col(id_col) == F.col("cluster_id")
    )


def link_rank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    damping: float = 0.85,
    iters: int = 5,
) -> DataFrame:
    """Weighted PageRank over an edge list; returns (node, rank).

    Fixed ``iters`` damped power-method steps from the uniform vector.
    rank_{t+1}(n) = (1-d)/N + d * (Σ_{(s→n)} rank_t(s) * w/out_w(s)
    + dangling_t/N) — dangling mass (nodes with no out-edges) is spread
    uniformly so Σ rank = 1 every step. Deterministic given the edge list.

    Scale shape: the weighted edge list is aggregated once, repartitioned
    by source and persisted; each iteration shuffles only the narrow
    (node, rank) table into that layout, contributions partially aggregate
    map-side in the keyed sum, and ranks are localCheckpoint-ed so the
    plan stays O(1) across iterations. No cartesian products, no
    collect() of anything graph-sized — the dangling term is a scalar
    aggregate.
    """
    ew = edges.select(
        F.col(src).alias("s"),
        F.col(dst).alias("d"),
        (F.col(weight) if weight else F.lit(1.0)).cast("double").alias("w"),
    )
    ew = ew.groupBy("s", "d").agg(F.sum("w").alias("w"))
    outw = ew.groupBy("s").agg(F.sum("w").alias("ow"))
    ew = (
        ew.join(outw, "s")
        .select("s", "d", (F.col("w") / F.col("ow")).alias("share"))
        .repartition("s")
        .persist()
    )
    nodes = (
        ew.select(F.col("s").alias("node"))
        .union(ew.select(F.col("d").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    has_out = ew.select(F.col("s").alias("node")).distinct().withColumn(
        "_has_out", F.lit(True)
    )
    nodes_o = nodes.join(has_out, "node", "left").select(
        "node", F.coalesce("_has_out", F.lit(False)).alias("has_out")
    ).persist()
    ranks = nodes_o.select("node", "has_out", F.lit(1.0 / n).alias("rank"))
    for _ in range(iters):
        dangling = ranks.where(~F.col("has_out")).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0))
        ).collect()[0][0]
        contribs = (
            ranks.join(ew, ranks["node"] == ew["s"])
            .select(F.col("d").alias("node"), (F.col("rank") * F.col("share")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("c"))
        )
        ranks = (
            nodes_o.join(contribs, "node", "left")
            .select(
                "node",
                "has_out",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce(F.col("c"), F.lit(0.0)) + F.lit(dangling / n))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    ew.unpersist()
    nodes.unpersist()
    nodes_o.unpersist()
    return ranks.select("node", "rank")


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    iters: int = 5,
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999): returns
    (node, hub, authority) after ``iters`` mutual-reinforcement steps,
    L2-normalized each half-step from the uniform start vector — the
    directory-page/content-page split PageRank's single score conflates
    (a hub host links out to many good authorities; an authority is
    linked from many good hubs). Deterministic given the edge list.

    ``iters`` must be >= 1 (a 0-step HITS has no defined authority vector).

    Same scale shape as ``link_rank``: the weighted edge list aggregates
    once, is repartitioned by join key and persisted; each half-step is
    one shuffle join + one keyed partial-aggregating sum; the L2 norms
    are scalar aggregates; scores are localCheckpoint-ed so the plan
    stays O(1) across iterations. No cartesian products anywhere.
    """
    if iters < 1:
        raise ValueError(f"hits() requires iters >= 1, got {iters}")
    ew = edges.select(
        F.col(src).alias("s"),
        F.col(dst).alias("d"),
        (F.col(weight) if weight else F.lit(1.0)).cast("double").alias("w"),
    )
    ew = ew.groupBy("s", "d").agg(F.sum("w").alias("w")).repartition("s").persist()
    nodes = (
        ew.select(F.col("s").alias("node"))
        .union(ew.select(F.col("d").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()

    def _l2(scores: DataFrame, col: str) -> float:
        v = scores.agg(F.sqrt(F.sum(F.col(col) * F.col(col)))).collect()[0][0]
        return float(v) if v else 1.0  # all-zero vector: leave it zero

    hub = nodes.select("node", F.lit(1.0 / (n ** 0.5)).alias("hub"))
    auth = None
    for _ in range(iters):
        a_raw = (
            hub.join(ew, hub["node"] == ew["s"])
            .select(F.col("d").alias("node"), (F.col("hub") * F.col("w")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("a"))
        )
        auth = nodes.join(a_raw, "node", "left").select(
            "node", F.coalesce("a", F.lit(0.0)).alias("a")
        ).localCheckpoint(eager=True)
        an = _l2(auth, "a")
        auth = auth.select("node", (F.col("a") / F.lit(an)).alias("authority"))
        h_raw = (
            auth.join(ew, auth["node"] == ew["d"])
            .select(F.col("s").alias("node"), (F.col("authority") * F.col("w")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("h"))
        )
        hub = nodes.join(h_raw, "node", "left").select(
            "node", F.coalesce("h", F.lit(0.0)).alias("h")
        ).localCheckpoint(eager=True)
        hn = _l2(hub, "h")
        hub = hub.select("node", (F.col("h") / F.lit(hn)).alias("hub"))
    out = hub.join(auth, "node")
    ew.unpersist()
    nodes.unpersist()
    return out.select("node", "hub", "authority")


def trust_rank(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    seed_col: str = "node",
    damping: float = 0.85,
    iters: int = 5,
) -> DataFrame:
    """TrustRank (Gyöngyi, Garcia-Molina & Pedersen, VLDB 2004): biased
    PageRank whose teleport vector is uniform over a curated SEED set of
    trusted hosts instead of uniform over all nodes — trust decays along
    out-links, so spam farms far from any seed get near-zero scores. The
    crawl-priority twin of ``link_rank`` for spam-aware frontier ordering
    (reference crawl priority: delphi-crawler schedules by maven-index
    order; a web-tier frontier wants a trust prior per host).

    Semantics (deterministic given edges + seeds):
      t_0(n)     = seed(n)                      (uniform 1/|S| over seeds)
      t_{k+1}(n) = (1-d)·seed(n) + d·(Σ_{(s→n)} t_k(s)·w/out_w(s)
                                      + dangling_k·seed(n))
    i.e. BOTH the teleport term and the dangling mass are redistributed
    through the seed vector (the static-score-distribution variant of the
    paper, eq. 4), so Σ t = 1 every step and non-seed spam islands with no
    seed-reachable in-path converge to exactly 0.

    Scale shape: identical to ``link_rank`` — the weighted edge list
    aggregates once, is repartitioned by source and persisted; each
    iteration shuffles only the narrow (node, trust) table; the dangling
    term is a scalar aggregate; trust vectors are localCheckpoint-ed so
    the plan stays O(1) across iterations. The seed table joins once into
    the node table (broadcast-sized by definition: seeds are curated).
    """
    ew = edges.select(
        F.col(src).alias("s"),
        F.col(dst).alias("d"),
        (F.col(weight) if weight else F.lit(1.0)).cast("double").alias("w"),
    )
    ew = ew.groupBy("s", "d").agg(F.sum("w").alias("w"))
    outw = ew.groupBy("s").agg(F.sum("w").alias("ow"))
    ew = (
        ew.join(outw, "s")
        .select("s", "d", (F.col("w") / F.col("ow")).alias("share"))
        .repartition("s")
        .persist()
    )
    nodes = (
        ew.select(F.col("s").alias("node"))
        .union(ew.select(F.col("d").alias("node")))
        .distinct()
        .persist()
    )
    has_out = ew.select(F.col("s").alias("node")).distinct().withColumn(
        "_has_out", F.lit(True)
    )
    seed_nodes = seeds.select(F.col(seed_col).alias("node")).distinct()
    n_seeds = seed_nodes.join(nodes, "node", "left_semi").count()
    if n_seeds == 0:
        raise ValueError("trust_rank() requires at least one seed present in the graph")
    nodes_o = (
        nodes.join(has_out, "node", "left")
        .join(
            F.broadcast(seed_nodes.withColumn("_is_seed", F.lit(True))),
            "node",
            "left",
        )
        .select(
            "node",
            F.coalesce("_has_out", F.lit(False)).alias("has_out"),
            F.when(F.col("_is_seed"), F.lit(1.0 / n_seeds))
            .otherwise(F.lit(0.0))
            .alias("seed_v"),
        )
        .persist()
    )
    trust = nodes_o.select("node", "has_out", "seed_v", F.col("seed_v").alias("trust"))
    for _ in range(iters):
        dangling = trust.where(~F.col("has_out")).agg(
            F.coalesce(F.sum("trust"), F.lit(0.0))
        ).collect()[0][0]
        contribs = (
            trust.join(ew, trust["node"] == ew["s"])
            .select(F.col("d").alias("node"), (F.col("trust") * F.col("share")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("c"))
        )
        trust = (
            nodes_o.join(contribs, "node", "left")
            .select(
                "node",
                "has_out",
                "seed_v",
                (
                    F.lit(1.0 - damping) * F.col("seed_v")
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("c"), F.lit(0.0))
                        + F.lit(dangling) * F.col("seed_v")
                    )
                ).alias("trust"),
            )
            .localCheckpoint(eager=True)
        )
    ew.unpersist()
    nodes.unpersist()
    nodes_o.unpersist()
    return trust.select("node", "trust")


def discovery_depth(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "node",
    max_depth: int = 10,
) -> DataFrame:
    """Crawl discovery depth: minimum hop count from the seed set along
    out-links — the ``depth`` column every BFS crawler tracks and caps
    (reference: delphi-crawler walks the maven index linearly and has no
    depth notion; a web-tier frontier schedules and prunes by it, e.g.
    depth-capped focused crawls). Returns (node, depth) for nodes
    reachable within ``max_depth`` hops; unreached nodes are absent.

    Frontier-parallel BFS: each round expands ONLY the nodes first
    discovered in the previous round (classic frontier optimization), so
    round k shuffles O(|frontier_k| join edges) — never the full depth
    table — and the loop exits early when a round discovers nothing new.
    Depth tables are localCheckpoint-ed so the plan stays O(1) across
    rounds. Deterministic given edges + seeds.
    """
    ew = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .distinct()
        .repartition("s")
        .persist()
    )
    depth = (
        seeds.select(F.col(seed_col).alias("node"))
        .distinct()
        .withColumn("depth", F.lit(0))
        .localCheckpoint(eager=True)
    )
    frontier = depth
    for k in range(1, max_depth + 1):
        discovered = (
            frontier.join(ew, frontier["node"] == ew["s"])
            .select(F.col("d").alias("node"))
            .distinct()
        )
        fresh = discovered.join(depth, "node", "left_anti").withColumn(
            "depth", F.lit(k)
        ).localCheckpoint(eager=True)
        if fresh.limit(1).count() == 0:
            break
        depth = depth.unionByName(fresh).localCheckpoint(eager=True)
        frontier = fresh
    ew.unpersist()
    return depth


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
) -> DataFrame:
    """Synchronous label propagation (Raghavan, Albert & Kumara, Phys. Rev.
    E 2007) for host-community detection: every node starts with its own
    id as its label; each round it adopts the label that is most frequent
    among its neighbors, ties broken by the smallest label — the
    deterministic synchronous variant, so the result is a pure function of
    the edge set and the iteration count (the paper's random tie-break and
    asynchronous order are replaced by (count DESC, label ASC), the same
    determinism discipline every ranking window in this engine follows).
    Communities group mutually-linked host neighborhoods: the crawl
    scheduler uses them to cap per-community fetch budgets (mirror farms
    and link rings collapse into one community long before pairwise mirror
    detection fires) and the training-data side uses them as leakage-safe
    split units one level above near-dup clusters.

    The graph is treated as undirected: edges are symmetrized and
    self-loops dropped. Isolated nodes cannot occur (every node appears in
    some edge); a node whose neighbors all carry its own label keeps it.

    Scale shape: per round, one hash-agg on the (node, label) grain — the
    neighbor-label multiset partially aggregates map-side — and one
    ranking window per node over its distinct neighbor labels (bounded by
    degree, never corpus-sized), then one equi-join back to the label
    table. The symmetrized edge list is repartitioned by ``s`` once and
    persisted so every round reuses the same co-location; label tables are
    localCheckpoint-ed each round so the plan stays O(1) in ``iters``. At
    10^10 nodes each round is O(|E|) shuffle — the same cost envelope as
    one ``link_rank`` step, with no scalar collect at all.

    Reference has no graph analytics (it walks the maven index linearly,
    IndexProcessing.scala:76-99); this extends the §2.10 graph family
    (connected_components / link_rank / hits / trust_rank).
    """
    if iters < 1:
        raise ValueError("label_propagation() needs iters >= 1")
    fwd = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    ew = (
        fwd.unionByName(fwd.select(F.col("d").alias("s"), F.col("s").alias("d")))
        .where(F.col("s") != F.col("d"))
        .distinct()
        .repartition("s")
        .persist()
    )
    from pyspark.sql import Window

    nodes = ew.select(F.col("s").alias("node")).distinct().persist()
    labels = nodes.select("node", F.col("node").alias("label"))
    w = Window.partitionBy("node").orderBy(F.col("cnt").desc(), F.col("label").asc())
    for _ in range(iters):
        counts = (
            ew.join(labels, ew["s"] == labels["node"])
            .groupBy(F.col("d").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        labels = (
            counts.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("node", "label")
            .localCheckpoint(eager=True)
        )
    ew.unpersist()
    nodes.unpersist()
    return labels


def opic_importance(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 4,
) -> DataFrame:
    """OPIC — the on-line page importance computation designed FOR crawl
    frontiers (Abiteboul, Preda & Cobena, WWW 2003): each node holds
    ``cash``; every round it distributes its cash equally over its
    out-edges (dangling nodes through the virtual page, i.e. uniformly
    over all N nodes — the standard virtual-node collapse) and banks the
    distributed amount into ``history``. The importance estimate after k
    rounds is ``(history + cash) / (k + 1)`` — total cash is invariant
    at 1 per round, so the denominator is exact. Unlike PageRank this
    needs no damping parameter and, in its on-line form, updates as pages
    are CRAWLED rather than on a frozen snapshot — the batch-synchronous
    rounds here are the deterministic testable core of that scheduler
    signal (the reference's analogue is priority-by-discovery ordering;
    OPIC is what replaces it when link evidence accumulates).

    Scale shape: identical to ``link_rank`` — the share-normalized edge
    list is deduped, repartitioned by source and persisted once; each
    round shuffles only the narrow (node, cash) table, the incoming-cash
    sum partial-aggregates map-side, the dangling term is a scalar
    aggregate, and localCheckpoint truncates lineage so the plan is O(1)
    across rounds.
    """
    if iters < 1:
        raise ValueError("opic_importance() needs iters >= 1")
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).distinct()
    outd = e.groupBy("s").agg(F.count(F.lit(1)).alias("od"))
    shares = (
        e.join(outd, "s")
        .select("s", "d", (F.lit(1.0) / F.col("od")).alias("share"))
        .repartition("s")
        .persist()
    )
    nodes = (
        e.select(F.col("s").alias("node"))
        .union(e.select(F.col("d").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    has_out = e.select(F.col("s").alias("node")).distinct().withColumn(
        "_has_out", F.lit(True)
    )
    state = (
        nodes.join(has_out, "node", "left")
        .select(
            "node",
            F.coalesce("_has_out", F.lit(False)).alias("has_out"),
            F.lit(1.0 / n).alias("cash"),
            F.lit(0.0).alias("hist"),
        )
        .persist()
    )
    for _ in range(iters):
        dangling = state.where(~F.col("has_out")).agg(
            F.coalesce(F.sum("cash"), F.lit(0.0))
        ).collect()[0][0]
        incoming = (
            state.join(shares, state["node"] == shares["s"])
            .select(F.col("d").alias("node"), (F.col("cash") * F.col("share")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("c"))
        )
        state = (
            state.join(incoming, "node", "left")
            .select(
                "node",
                "has_out",
                (F.coalesce(F.col("c"), F.lit(0.0)) + F.lit(dangling / n)).alias("cash"),
                (F.col("hist") + F.col("cash")).alias("hist"),
            )
            .localCheckpoint(eager=True)
        )
    shares.unpersist()
    nodes.unpersist()
    return state.select(
        "node",
        "cash",
        F.col("hist").alias("history"),
        ((F.col("hist") + F.col("cash")) / F.lit(float(iters + 1))).alias("importance"),
    )


def neighborhood_function(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_t: int = 4,
    eff_frac: float = 0.9,
) -> DataFrame:
    """EXACT neighborhood function N(t) = #{(u,v): dist(u,v) <= t} for
    t = 0..max_t, plus the effective diameter (smallest t whose N(t)
    reaches ``eff_frac`` of N(max_t)) — the graph-telemetry a crawl uses
    to judge how connected its discovered host graph is (Palmer KDD'02
    ANF; Boldi & Vigna WWW'11 HyperANF is the sketched scale path, see
    ``hyperanf_neighborhood``).

    Exact semantics by iterated sparse closure: reach_t = reach_{t-1} ∪
    (reach_{t-1} ⋈ edges), distinct-deduped each round — keyed equi-joins
    and hash-aggs only, localCheckpoint lineage truncation, per-round
    counts are scalar aggregates. The pair table is O(N(t)) — exact is
    for analysis-sized graphs (hosts, not URLs); at web scale the
    HyperANF twin holds per-node registers instead of pairs.

    Returns one row per t: (t, n_pairs, frac, eff_diameter).
    """
    if max_t < 1:
        raise ValueError("neighborhood_function() needs max_t >= 1")
    spark = edges.sparkSession
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).distinct().persist()
    nodes = (
        e.select(F.col("s").alias("node"))
        .union(e.select(F.col("d").alias("node")))
        .distinct()
    )
    reach = nodes.select(
        F.col("node").alias("u"), F.col("node").alias("v")
    ).localCheckpoint(eager=True)
    counts = [reach.count()]
    for _ in range(max_t):
        expanded = (
            reach.join(e, reach["v"] == e["s"])
            .select("u", F.col("d").alias("v"))
        )
        reach = reach.union(expanded).distinct().localCheckpoint(eager=True)
        counts.append(reach.count())
    e.unpersist()
    n_max = counts[-1]
    eff_d = next(t for t, c in enumerate(counts) if c >= eff_frac * n_max)
    # plain IEEE double division (no rounding) so a SQL twin computing
    # the same integer-count ratio is bit-identical
    rows = [(t, c, c / n_max, eff_d) for t, c in enumerate(counts)]
    return spark.createDataFrame(
        rows, "t long, n_pairs long, frac double, eff_diameter long"
    )


def hyperanf_neighborhood(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_t: int = 4,
    p: int = 12,
) -> DataFrame:
    """HyperANF (Boldi, Rosa & Vigna, WWW 2011): the neighborhood function
    at web scale — each node carries an HLL sketch of its reachable set;
    one round is B_t(u) = B_{t-1}(u) ∪ ⋃_{u→v} B_{t-1}(v), realized as a
    register-wise MAX merge (exact for HLL, the same property the seen-set
    telemetry relies on, operators/hll.py). State is O(nodes * 2^p) bytes
    instead of O(pairs): p=12 is 4 KiB/node; web graphs run p=7.

    Spark shape: registers are a binary column; each round is one keyed
    equi-join (edge dst side) + one groupBy(node) Arrow applyInPandas
    doing ``np.maximum.reduce`` over the stacked register matrix (a
    vectorized C loop, no per-row python), then a register-summing scalar
    pass for the N(t) estimate. Deterministic: xxhash64 node hashing, no
    rng anywhere. Estimates are Flajolet-corrected like operators/hll.py
    (shared ``HLL`` math).

    Exactness discipline: N(t) = Σ_nodes estimate(node) would be a float
    sum whose value depends on partition order; instead each per-node
    estimate is rounded half-up to integer MICROS (floor(e·1e6 + 0.5)) and
    summed as exact int64 — order-independent, so reruns and the
    independent expected-parquet oracle (tools/gen_expected.py) agree
    bit-for-bit. est_pairs = micros / 1e6.

    Returns (t, est_pairs) for t = 0..max_t.
    """
    import math
    import pandas as pd

    from delphi_crawler_spark.operators.hll import HLL, hll_fold

    if max_t < 1:
        raise ValueError("hyperanf_neighborhood() needs max_t >= 1")
    spark = edges.sparkSession
    m = 1 << p
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).distinct().persist()
    nodes = (
        e.select(F.col("s").alias("node"))
        .union(e.select(F.col("d").alias("node")))
        .distinct()
    )

    def init_regs(batches):
        # singleton sketches, batch-vectorized: the shared hll_fold rank
        # kernel over the whole batch, scattered into a (rows x m) uint8
        # matrix in one fancy-index assignment — no per-row Python
        for pdf in batches:
            h = pdf["h"].to_numpy(dtype=np.int64).astype(np.uint64)
            idx, ranks = hll_fold(p, h)
            mat = np.zeros((len(h), m), dtype=np.uint8)
            mat[np.arange(len(h)), idx] = ranks
            yield pd.DataFrame(
                {"node": pdf["node"], "regs": [r.tobytes() for r in mat]}
            )

    regs = (
        nodes.select("node", F.xxhash64("node").cast("long").alias("h"))
        .mapInPandas(init_regs, "node string, regs binary")
        .localCheckpoint(eager=True)
    )

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        mat = np.frombuffer(b"".join(pdf["regs"]), dtype=np.uint8).reshape(
            len(pdf), m
        )
        return pd.DataFrame(
            {"node": [pdf["node"].iloc[0]], "regs": [np.maximum.reduce(mat).tobytes()]}
        )

    def est_total(pdf_iter):
        # per-partition exact int64 sum of per-node micro-estimates; the
        # inner work per row is a C-level 2^p-vector op (HLL.estimate)
        for pdf in pdf_iter:
            tot = 0
            for b in pdf["regs"]:
                h = HLL(p=p, regs=np.frombuffer(b, dtype=np.uint8).copy())
                tot += int(math.floor(h.estimate() * 1e6 + 0.5))
            yield pd.DataFrame({"part_micros": pd.array([tot], dtype="int64")})

    def estimate(r: DataFrame) -> float:
        micros = (
            r.select("regs")
            .mapInPandas(est_total, "part_micros long")
            .agg(F.sum("part_micros"))
            .collect()[0][0]
        )
        return int(micros) / 1e6

    out_rows = [(0, estimate(regs))]
    for t in range(1, max_t + 1):
        contrib = (
            e.join(regs, e["d"] == regs["node"])
            .select(F.col("s").alias("node"), "regs")
        )
        regs = (
            regs.unionByName(contrib)
            .groupBy("node")
            .applyInPandas(merge_group, "node string, regs binary")
            .localCheckpoint(eager=True)
        )
        out_rows.append((t, estimate(regs)))
    e.unpersist()
    return spark.createDataFrame(out_rows, "t long, est_pairs double")


def pld_graph_contract(
    edges: DataFrame,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
) -> DataFrame:
    """Contract the host link graph to registrable-domain (PLD) grain —
    the standard web-graph reduction (the public Common Crawl host/PLD
    graphs publish exactly this pair): rank, trust and budget decisions
    are usually PER OPERATOR, and one operator spans many hosts
    (www./api./cdn. subdomains) while blogspot-style suffixes split the
    other way. Intra-domain edges (site navigation) are dropped — they
    carry no inter-operator endorsement.

    Output per (src_domain, dst_domain): ``n_links`` (host-edge
    multiplicity mass) and ``n_src_hosts`` (distinct linking hosts — the
    anti-spam denominator: 10k links from ONE host ≠ 10k hosts).

    Scale shape: the PLD map is the codegen-literal suffix match
    (``domains.registrable_domain`` — no join, no Python), then ONE
    partial-aggregating hash-agg on the contracted pair; count_distinct
    adds its standard two-phase expansion on the same grain. Output is
    domains² ≪ hosts² — the contraction that makes PageRank/TrustRank
    over the full web graph tractable at PLD grain.

    Reference parity: none (Maven has no host graph); feeds
    ``link_rank``/``trust_rank``/``label_propagation`` unchanged — they
    are grain-agnostic over (src, dst, weight).
    """
    from delphi_crawler_spark.operators.domains import registrable_domain

    d = edges.select(
        registrable_domain(F.col(src_col)).alias("src_domain"),
        registrable_domain(F.col(dst_col)).alias("dst_domain"),
        F.col(src_col).alias("_src_host"),
    ).filter(F.col("src_domain") != F.col("dst_domain"))
    return d.groupBy("src_domain", "dst_domain").agg(
        F.count(F.lit(1)).alias("n_links"),
        F.count_distinct(F.col("_src_host")).alias("n_src_hosts"),
    )


def kcore_membership(
    edges: DataFrame,
    k: int,
    max_iter: int = 16,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """k-core of the (undirected) host graph via iterative peeling
    (Batagelj & Zaveršnik 2003; the synchronous distributed variant of
    Montresor, De Pellegrini & Miorandi 2011): repeatedly delete every
    node whose degree in the SURVIVING subgraph is < k until a fixpoint.
    What survives is the maximal subgraph with minimum degree ≥ k — the
    standard density signal for link-farm / spam-cluster detection (a
    farm's mutually-linked hosts sit in a high core; organically linked
    hosts fall out after a few peels) and for picking well-embedded seed
    hosts. Output: ``(node, core_degree)`` for k-core members, with the
    node's degree inside the core.

    Determinism: the fixpoint of peeling is unique (independent of
    removal order — Batagelj's theorem), and running a fixed
    ``max_iter`` of synchronous rounds is also a pure function of the
    edge set, so results match an identically-unrolled oracle whether or
    not convergence happened first (post-fixpoint rounds are no-ops).

    Scale shape: edges are symmetrized, de-duplicated and self-loop-
    free; each round is one hash-agg (degrees, map-side partials) + two
    left-semi joins on the surviving node set, with ``localCheckpoint``
    truncating lineage so the plan stays O(1) in rounds. The only
    driver values are two scalar counts per round for the convergence
    test. Peeling converges in O(degeneracy) synchronous rounds on real
    web graphs (≪ max_iter).

    Reference has no graph analytics; extends the §2.10 family
    (connected_components / link_rank / label_propagation).
    """
    if k < 1:
        raise ValueError("kcore_membership() needs k >= 1")
    fwd = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    e = (
        fwd.unionByName(fwd.select(F.col("d").alias("s"), F.col("s").alias("d")))
        .where(F.col("s") != F.col("d"))
        .distinct()
        .repartition("s")
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        deg = e.groupBy("s").agg(F.count(F.lit(1)).alias("deg"))
        keep = deg.filter(F.col("deg") >= F.lit(int(k))).select("s")
        n_nodes, n_keep = deg.count(), keep.count()
        if n_keep == n_nodes:
            break
        e = (
            e.join(keep, "s", "left_semi")
            .join(keep.withColumnRenamed("s", "d"), "d", "left_semi")
            .select("s", "d")
            .localCheckpoint(eager=True)
        )
        if n_keep == 0:
            break
    return e.groupBy(F.col("s").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("core_degree")
    )


def triangle_counts(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Per-node triangle counts + local clustering coefficient via the
    degree-ordered orientation (the MapReduce-era standard: Suri &
    Vassilvitskii WWW'11 / Cohen 2009): orient each undirected edge from
    its lower-(degree, id) endpoint to the higher one, enumerate wedges
    only at each edge's SMALLER endpoint, and close them with one join
    back to the oriented edge set. Every triangle is found exactly once,
    and the wedge intermediate is Σ d_out² with d_out ≤ O(√|E|) for any
    graph — the skew bound that makes this feasible where naive
    wedge-at-every-node explodes on power-law hubs (a 10^7-degree host
    would otherwise emit 10^14 wedges).

    Clustering coefficient = 2·T / (d·(d−1)) (0 where d < 2) — the
    link-farm tell: spam rings sit near 1.0 at high degree, organic hubs
    near 0. Output: (node, degree, n_triangles, clustering_coeff).

    Scale shape: one degree hash-agg, two joins to attach endpoint
    degrees, one self-join on the wedge pivot, one membership join, and
    a final 3-way-union count — all keyed equi-joins on node/edge keys,
    no iteration.
    """
    fwd = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    und = (
        fwd.unionByName(fwd.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = und.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
    # attach degrees to both endpoints, orient low -> high
    e = (
        und.join(deg.withColumnRenamed("deg", "da"), "a")
        .join(
            deg.select(F.col("a").alias("b"), F.col("deg").alias("db")), "b"
        )
        .where(
            (F.col("da") < F.col("db"))
            | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b")))
        )
        .select("a", "b")
    )
    # wedges at the smaller endpoint: (a -> b), (a -> c), b < c in the
    # orientation's total order is implied by joining closure b -> c
    w1 = e.select(F.col("a").alias("p"), F.col("b").alias("x"))
    w2 = e.select(F.col("a").alias("p"), F.col("b").alias("y"))
    wedges = w1.join(w2, "p").where(F.col("x") != F.col("y"))
    closed = wedges.join(
        e.select(F.col("a").alias("x"), F.col("b").alias("y")), ["x", "y"]
    )
    tri_nodes = (
        closed.select(F.col("p").alias("node"))
        .unionByName(closed.select(F.col("x").alias("node")))
        .unionByName(closed.select(F.col("y").alias("node")))
    )
    per_node = tri_nodes.groupBy("node").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    d = F.col("deg").cast("double")
    return (
        deg.select(F.col("a").alias("node"), "deg")
        .join(per_node, "node", "left")
        .select(
            "node",
            F.col("deg").cast("bigint").alias("degree"),
            F.coalesce(F.col("n_triangles"), F.lit(0)).cast("bigint").alias("n_triangles"),
            F.when(
                F.col("deg") >= 2,
                F.round(
                    2.0 * F.coalesce(F.col("n_triangles"), F.lit(0)) / (d * (d - 1)),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("clustering_coeff"),
        )
    )


def bowtie_decomposition(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_depth: int = 16,
) -> DataFrame:
    """Web bow-tie decomposition (Broder et al., WWW 2000): classify
    every node of the directed host graph relative to the strongly
    connected core around a deterministic pivot — the max-out-degree
    node (smallest id on ties). ``CORE`` = reaches the pivot AND is
    reached by it (the pivot's SCC, by mutual reachability), ``IN`` =
    reaches the core but isn't reached, ``OUT`` = reached but doesn't
    reach back, ``OTHER`` = tendrils/tubes/disconnected. The macro
    shape drives crawl seeding strategy: seeds outside IN∪CORE can
    never discover the core's mass by link following.

    Two frontier-parallel BFS passes (``discovery_depth``) — forward
    from the pivot and backward on the reversed edge list — then one
    outer join + classification projection. Each pass is O(|E|) per
    round with early exit; no all-pairs anything. Output:
    (node, fwd_depth, bwd_depth, component).
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).distinct()
    outdeg = e.groupBy("s").agg(F.count(F.lit(1)).alias("od"))
    pivot_row = outdeg.orderBy(F.col("od").desc(), F.col("s").asc()).limit(1).collect()
    if not pivot_row:
        return edges.sparkSession.createDataFrame(
            [], "node string, fwd_depth bigint, bwd_depth bigint, component string"
        )
    pivot = pivot_row[0]["s"]
    spark = edges.sparkSession
    seeds = spark.createDataFrame([(pivot,)], ["node"])
    fwd = discovery_depth(e, seeds, src="s", dst="d", max_depth=max_depth)
    bwd = discovery_depth(
        e.select(F.col("d").alias("s"), F.col("s").alias("d")),
        seeds,
        src="s",
        dst="d",
        max_depth=max_depth,
    )
    nodes = (
        e.select(F.col("s").alias("node"))
        .unionByName(e.select(F.col("d").alias("node")))
        .distinct()
    )
    j = (
        nodes.join(fwd.withColumnRenamed("depth", "fwd_depth"), "node", "left")
        .join(bwd.withColumnRenamed("depth", "bwd_depth"), "node", "left")
    )
    has_f = F.col("fwd_depth").isNotNull()
    has_b = F.col("bwd_depth").isNotNull()
    comp = (
        F.when(has_f & has_b, F.lit("CORE"))
        .when(has_b, F.lit("IN"))
        .when(has_f, F.lit("OUT"))
        .otherwise(F.lit("OTHER"))
    )
    return j.select(
        "node",
        F.col("fwd_depth").cast("bigint").alias("fwd_depth"),
        F.col("bwd_depth").cast("bigint").alias("bwd_depth"),
        comp.alias("component"),
    )


def graph_structure_stats(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Whole-graph structural fingerprint: reciprocity + degree
    assortativity (Newman 2002) — the two scalars a crawl-graph health
    dashboard wants per snapshot (link farms push reciprocity toward 1
    and assortativity positive; organic webs are weakly reciprocal and
    disassortative, Broder 2000).

    - ``reciprocity``: fraction of distinct non-loop directed edges whose
      reverse edge also exists (one self-semi-join on the edge key);
    - ``assortativity``: Pearson correlation, over edges (u, v), of
      out-degree(u) against in-degree(v). Degree products accumulate as
      ``decimal(38,0)`` — exact at any partition count (deg² overflows
      bigint beyond ~3·10^9-degree hubs); the final correlation is one
      double expression from those exact sums, rounded 6 (engine-exact,
      mirrored in the SQL oracle). NULL when < 2 edges or zero variance.

    Returns one row: (n_nodes, n_edges, n_reciprocal, reciprocity,
    assortativity). Shape: distinct edge hash-agg, two degree hash-aggs
    joined back on their own keys, one semi-join, one scalar agg —
    every shuffle keyed, nothing collects."""
    e = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .filter(F.col("s") != F.col("d"))
        .distinct()
    )
    outdeg = e.groupBy("s").agg(F.count(F.lit(1)).alias("x"))
    indeg = e.groupBy("d").agg(F.count(F.lit(1)).alias("y"))
    rev = e.select(F.col("d").alias("s"), F.col("s").alias("d"))
    recip = e.join(rev, ["s", "d"], "left_semi")
    nodes = e.select(F.col("s").alias("n")).union(
        e.select(F.col("d").alias("n"))
    ).distinct()

    dec = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    pairs = e.join(outdeg, "s").join(indeg, "d")
    stats = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum(dec("x")).alias("sx"),
        F.sum(dec("y")).alias("sy"),
        F.sum(dec("x") * dec("y")).alias("sxy"),
        F.sum(dec("x") * dec("x")).alias("sxx"),
        F.sum(dec("y") * dec("y")).alias("syy"),
    )
    n_nodes = nodes.count()
    n_recip = recip.count()
    m = F.col("m").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    cov = m * F.col("sxy").cast("double") - sx * sy
    vx = m * F.col("sxx").cast("double") - sx * sx
    vy = m * F.col("syy").cast("double") - sy * sy
    assort = F.when(
        (F.col("m") >= 2) & (vx > 0) & (vy > 0),
        F.round(cov / (F.sqrt(vx) * F.sqrt(vy)), 6),
    )
    return stats.select(
        F.lit(int(n_nodes)).cast("bigint").alias("n_nodes"),
        F.col("m").alias("n_edges"),
        F.lit(int(n_recip)).cast("bigint").alias("n_reciprocal"),
        F.when(
            F.col("m") > 0,
            F.round(F.lit(float(n_recip)) / m, 6),
        ).alias("reciprocity"),
        assort.alias("assortativity"),
    )


def deterministic_random_walks(
    edges: DataFrame,
    walk_len: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Hash-decided graph walks — the node2vec/DeepWalk corpus prep
    (Grover & Leskovec 2016; Perozzi 2014) made deterministic and
    distributed: one walk starts at every node, and at step t the walk
    at node v (started from s) moves to neighbor number
    ``md5(s|v|t) mod degree(v)`` in dst-sorted order. A hash in place of
    an RNG keeps every walk a pure function of the edge set — rerun- and
    partition-stable (the engine-wide determinism discipline), exactly
    replicable in a SQL oracle, and still uniform-ish per step.

    Walks terminate early at sinks (no out-edges). Returns one row per
    visited position: (start, step, node), step 0 = the start itself.

    Shape: adjacency = one (src)-keyed window (idx in dst order) +
    degree hash-agg; each of the ``walk_len`` steps is TWO strictly
    keyed equi-joins: frontier × degree (node-sized, broadcastable) to
    resolve ``pick_idx = hash % deg`` BEFORE touching the adjacency,
    then frontier × adjacency on the two-key (u, idx). The pick filter
    is therefore part of the join key — a degree-10^6 hub contributes
    exactly one adjacency row per visiting walk, never a 10^6-row
    fanout that a post-join filter would have to discard. Frontier
    never exceeds |nodes| rows per step. At 10^9 edges the adjacency
    index is the thing to bucket by (src, idx) once and reuse across
    all steps AND all downstream walk batches."""
    if walk_len < 1:
        raise ValueError("deterministic_random_walks() needs walk_len >= 1")
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).distinct()
    from pyspark.sql import Window

    w = Window.partitionBy("u").orderBy("v")
    adj = e.select(
        "u", "v", (F.row_number().over(w) - 1).cast("bigint").alias("idx")
    ).persist()
    deg = adj.groupBy("u").agg(F.count(F.lit(1)).alias("deg")).persist()

    nodes = e.select(F.col("u").alias("node")).union(
        e.select(F.col("v").alias("node"))
    ).distinct()
    frontier = nodes.select(
        F.col("node").alias("start"), F.col("node").alias("cur")
    )
    rows = frontier.select("start", F.lit(0).alias("step"), F.col("cur").alias("node"))
    out = rows
    for t in range(1, walk_len + 1):
        fr = frontier.alias("fr")
        dt = deg.alias(f"d{t}")
        pick = F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|", F.col("fr.start"), F.col("fr.cur"), F.lit(str(t))
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        # Stage 1: node-sized join just to learn deg(cur) and compute the
        # neighbor ordinal — no adjacency rows involved yet.
        picked = (
            fr.join(dt, F.col("fr.cur") == F.col(f"d{t}.u"))
            .select(
                F.col("fr.start").alias("start"),
                F.col("fr.cur").alias("cur"),
                (pick % F.col(f"d{t}.deg")).alias("pick_idx"),
            )
        )
        # Stage 2: two-key equi-join — (cur, pick_idx) == (u, idx) — so the
        # shuffle/probe key already includes the ordinal; zero fanout.
        at = adj.alias(f"a{t}")
        stepped = (
            picked.join(
                at,
                (F.col("cur") == F.col(f"a{t}.u"))
                & (F.col("pick_idx") == F.col(f"a{t}.idx")),
            )
            .select(F.col("start"), F.col(f"a{t}.v").alias("cur"))
        )
        out = out.unionByName(
            stepped.select("start", F.lit(t).alias("step"), F.col("cur").alias("node"))
        )
        frontier = stepped
    result = out.select(
        "start", F.col("step").cast("bigint").alias("step"), "node"
    )
    result._release_walks = (  # type: ignore[attr-defined]
        lambda: (adj.unpersist(), deg.unpersist())
    )
    return result


def modularity_score(
    edges: DataFrame,
    communities: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    label_col: str = "label",
) -> DataFrame:
    """Newman modularity of a community assignment over the symmetrized
    simple graph — the single number that says whether LPA/CC output is
    real structure or noise (Q ≈ 0: no better than random; 0.3+: strong
    communities; link-farm rings score high and that IS the signal):

        Q = Σ_c [ m_c/m − (d_c / 2m)² ]

    with m undirected edges, m_c intra-community edges, d_c the sum of
    community degrees. Graph normalization matches
    ``label_propagation``: symmetrized, deduped, self-loop-free; each
    undirected edge counted once via (u < v) canonical order.

    Exactness: m_c, d_c, m are exact integers; the two ratio terms
    square/divide in double per community, each term rounds to 6 and
    accumulates as decimal(28,6) (order-exact), final Q rounds 6.
    Returns one row: (n_communities, n_edges, modularity).

    Shape: edge canonicalization hash-agg, two label joins onto edges
    (broadcastable label table), one community hash-agg + one scalar
    agg. Nothing collects but the final row."""
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
        )
        .distinct()
    )
    lab = communities.select(
        F.col(node_col).alias("n"), F.col(label_col).alias("c")
    )
    lu = lab.withColumnRenamed("n", "u").withColumnRenamed("c", "cu")
    lv = lab.withColumnRenamed("n", "v").withColumnRenamed("c", "cv")
    e = und.join(lu, "u").join(lv, "v")
    m_df = e.agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    # degrees per community: each undirected edge adds 1 to each endpoint
    deg = (
        e.select(F.col("cu").alias("c")).unionByName(e.select(F.col("cv").alias("c")))
        .groupBy("c")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d_c"))
    )
    intra = (
        e.filter(F.col("cu") == F.col("cv"))
        .groupBy(F.col("cu").alias("c"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("m_c"))
    )
    per = deg.join(intra, "c", "left").select(
        "c",
        F.coalesce("m_c", F.lit(0)).alias("m_c"),
        "d_c",
    ).crossJoin(F.broadcast(m_df))
    md = F.col("m").cast("double")
    term = F.round(
        F.col("m_c").cast("double") / md
        - (F.col("d_c").cast("double") / (F.lit(2.0) * md))
        * (F.col("d_c").cast("double") / (F.lit(2.0) * md)),
        6,
    ).cast("decimal(28,6)")
    out = per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_communities"),
        F.first("m").alias("n_edges"),
        F.round(F.sum(term).cast("double"), 6).alias("modularity"),
    )
    return out


def cocitation_similarity(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    min_shared: int = 2,
    max_target_indegree: int = 1000,
) -> DataFrame:
    """Co-citation link similarity (Small 1973; the SimRank-lite every
    related-sites feature starts from): two sources are similar when
    they link to the same targets — Jaccard over OUT-link sets, computed
    WITHOUT all-pairs by bucketing on the shared target (the minhash-
    banding shape applied to graph structure; complements r7's
    content-digest mirror detection with pure link evidence).

    Skew guard: targets with in-degree > ``max_target_indegree`` are
    DROPPED before pairing (a mega-hub like a CDN domain pairs everyone
    with everyone and says nothing — the standard co-citation practice
    of discounting ubiquitous cites; the cap makes the per-target pair
    fan-out bounded, so the shuffle is Σ min(indeg, cap)² not n²).

    Returns (src_a, src_b, n_shared, deg_a, deg_b, jaccard) for pairs
    with ≥ ``min_shared`` shared targets, src_a < src_b, jaccard =
    shared / (deg_a + deg_b − shared) over the UNCAPPED out-degrees
    (the cap prunes pair GENERATION, not the similarity definition —
    shared counts through capped hubs are simply underestimates, also
    standard). Rounded 6."""
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).filter(
        F.col("s") != F.col("d")
    ).distinct()
    outdeg = e.groupBy("s").agg(F.count(F.lit(1)).alias("deg"))
    indeg = e.groupBy("d").agg(F.count(F.lit(1)).alias("ind"))
    kept = e.join(
        indeg.filter(F.col("ind") <= max_target_indegree).select("d"), "d"
    )
    a = kept.select(F.col("d"), F.col("s").alias("src_a"))
    b = kept.select(F.col("d"), F.col("s").alias("src_b"))
    pairs = (
        a.join(b, "d")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    da = outdeg.select(F.col("s").alias("src_a"), F.col("deg").alias("deg_a"))
    db = outdeg.select(F.col("s").alias("src_b"), F.col("deg").alias("deg_b"))
    j = pairs.join(da, "src_a").join(db, "src_b")
    union = F.col("deg_a") + F.col("deg_b") - F.col("n_shared")
    return j.select(
        "src_a",
        "src_b",
        "n_shared",
        F.col("deg_a").cast("bigint").alias("deg_a"),
        F.col("deg_b").cast("bigint").alias("deg_b"),
        F.round(F.col("n_shared").cast("double") / union.cast("double"), 6).alias(
            "jaccard"
        ),
    )
