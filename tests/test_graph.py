"""Graph operators: connected components vs a union-find oracle, link-rank
invariants, determinism across parallelism, and plan audits.

CC correctness cannot lean on a SQL oracle alone (the driver's recursive-CTE
check covers one fixture); here random graphs of several shapes (sparse,
chains, stars, dense blobs) are checked against an independent union-find.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from delphi_crawler_spark.operators.graph import (
    connected_components,
    link_rank,
    neardup_clusters,
)


def _union_find(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # collapse to min id per component
    comp = {}
    for x in range(n_nodes):
        r = find(x)
        comp.setdefault(r, []).append(x)
    return {x: min(members) for r, members in comp.items() for x in members}


def _cc_spark(spark, edges):
    df = spark.createDataFrame(edges, "src: long, dst: long")
    out = connected_components(df)
    return {r["node"]: r["component"] for r in out.collect()}


@pytest.mark.parametrize("seed,n,m", [(1, 60, 40), (2, 200, 150), (3, 50, 120)])
def test_cc_matches_union_find_random(spark, seed, n, m):
    rng = random.Random(seed)
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
    edges = [(u, v) for u, v in edges if u != v]
    got = _cc_spark(spark, edges)
    want = _union_find(n, edges)
    touched = {u for e in edges for u in e}
    assert got == {x: want[x] for x in touched}


def test_cc_long_chain_converges(spark):
    """A 300-node path is the worst case for naive label propagation
    (O(diameter) rounds); large-star/small-star must still converge within
    the max_iter guard and label every node with the chain head."""
    edges = [(i, i + 1) for i in range(300)]
    got = _cc_spark(spark, edges)
    assert got == {i: 0 for i in range(301)}


def test_cc_transitive_not_just_pairwise(spark):
    # A~B, B~C but never A~C: all three must share a cluster.
    got = _cc_spark(spark, [(10, 20), (20, 30), (40, 50)])
    assert got == {10: 10, 20: 10, 30: 10, 40: 40, 50: 40}


def test_cc_deterministic_across_parallelism(spark):
    rng = random.Random(7)
    edges = [(rng.randrange(100), rng.randrange(100)) for _ in range(80)]
    edges = [(u, v) for u, v in edges if u != v]
    df3 = spark.createDataFrame(edges, "src: long, dst: long").repartition(3)
    df11 = spark.createDataFrame(edges, "src: long, dst: long").repartition(11)
    a = sorted(map(tuple, connected_components(df3).collect()))
    b = sorted(map(tuple, connected_components(df11).collect()))
    assert a == b


def test_neardup_clusters_singletons_and_canonical(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id: long")
    pairs = spark.createDataFrame([(0, 1), (1, 2)], "id_a: long, id_b: long")
    rows = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"], r["is_canonical"])
        for r in neardup_clusters(docs, pairs).collect()
    }
    assert rows == {
        0: (0, 3, True),
        1: (0, 3, False),
        2: (0, 3, False),
        3: (3, 1, True),
        4: (4, 1, True),
        5: (5, 1, True),
    }
    assert sum(1 for _, _, can in rows.values() if can) == 4


def _rank_fixture(spark):
    # two hubs, a chain, and a dangling sink (node 9 has no out-edges)
    edges = [
        (1, 2), (3, 2), (4, 2), (5, 2),  # 2 is a hub
        (2, 6), (6, 7), (7, 9), (8, 9),  # 9 dangles
        (1, 6),
    ]
    return spark.createDataFrame(edges, "src: long, dst: long")


def test_link_rank_sums_to_one_and_ranks_hub(spark):
    ranks = {r["node"]: r["rank"] for r in link_rank(_rank_fixture(spark)).collect()}
    # dangling redistribution keeps total mass at 1
    assert abs(sum(ranks.values()) - 1.0) < 1e-9
    # the hub out-ranks every leaf that points at it
    assert ranks[2] > ranks[1]
    assert ranks[2] > ranks[3]
    # the dangling sink still accumulates rank from its in-links
    assert ranks[9] > (1 - 0.85) / len(ranks)


def test_link_rank_deterministic_across_parallelism(spark):
    e = _rank_fixture(spark)
    a = sorted(map(tuple, link_rank(e.repartition(2)).collect()))
    b = sorted(map(tuple, link_rank(e.repartition(13)).collect()))
    assert [(n, round(r, 12)) for n, r in a] == [(n, round(r, 12)) for n, r in b]


def test_graph_plans_no_cartesian(spark):
    """Every join in both operators is an equi-join: no cartesian products
    or broadcast nested loops on any iteration's plan."""
    edges = spark.createDataFrame(
        [(i, (i * 7) % 50) for i in range(200) if i != (i * 7) % 50],
        "src: long, dst: long",
    )
    for out in (connected_components(edges), link_rank(edges, iters=2)):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_link_rank_matches_independent_numpy(spark):
    """Spec-level cross-check: damped power method with uniform dangling
    redistribution implemented independently in numpy (dense matrix),
    compared to the operator on a random weighted digraph."""
    import numpy as np

    rng = random.Random(11)
    n = 30
    edges = []
    for _ in range(120):
        u, v = rng.randrange(n), rng.randrange(n)
        if u != v:
            edges.append((u, v, float(rng.randrange(1, 5))))
    df = spark.createDataFrame(edges, "src: long, dst: long, w: double")
    got = {r["node"]: r["rank"] for r in link_rank(df, weight="w", iters=7).collect()}

    nodes = sorted({u for u, v, _ in edges} | {v for _, v, _ in edges})
    idx = {x: i for i, x in enumerate(nodes)}
    m = len(nodes)
    W = np.zeros((m, m))
    for u, v, w in edges:
        W[idx[u], idx[v]] += w
    outw = W.sum(axis=1)
    has_out = outw > 0
    P = np.divide(W, outw[:, None], out=np.zeros_like(W), where=has_out[:, None])
    d, r = 0.85, np.full(m, 1.0 / m)
    for _ in range(7):
        dangling = r[~has_out].sum()
        r = (1 - d) / m + d * (r @ P + dangling / m)
    for x in nodes:
        assert abs(got[x] - r[idx[x]]) < 1e-9
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_cc_raises_loudly_if_not_converged(spark):
    edges = spark.createDataFrame([(i, i + 1) for i in range(20)], "src: long, dst: long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=1)


def test_hits_matches_independent_numpy(spark):
    """Spec-level cross-check of HITS: uniform start, L2 normalization per
    half-step, reimplemented independently in dense numpy."""
    import numpy as np

    from delphi_crawler_spark.operators.graph import hits

    rng = random.Random(23)
    n = 25
    edges = []
    for _ in range(100):
        u, v = rng.randrange(n), rng.randrange(n)
        if u != v:
            edges.append((u, v))
    df = spark.createDataFrame(edges, "src: long, dst: long")
    got = {r["node"]: (r["hub"], r["authority"]) for r in hits(df, iters=6).collect()}

    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {x: i for i, x in enumerate(nodes)}
    m = len(nodes)
    W = np.zeros((m, m))
    for u, v in edges:
        W[idx[u], idx[v]] += 1.0
    h = np.full(m, 1.0 / m ** 0.5)
    for _ in range(6):
        a = W.T @ h
        a = a / (np.linalg.norm(a) or 1.0)
        h = W @ a
        h = h / (np.linalg.norm(h) or 1.0)
    for x in nodes:
        gh, ga = got[x]
        assert abs(gh - h[idx[x]]) < 1e-9
        assert abs(ga - a[idx[x]]) < 1e-9
    # a pure source has authority 0; a pure sink has hub 0
    srcs = {u for u, _ in edges} - {v for _, v in edges}
    sinks = {v for _, v in edges} - {u for u, _ in edges}
    for x in srcs:
        assert got[x][1] == 0.0
    for x in sinks:
        assert got[x][0] == 0.0


def test_trust_rank_matches_independent_numpy_and_zeroes_spam_island(spark):
    """Spec-level cross-check of TrustRank (Gyöngyi 2004): seed-biased
    teleport + seed-routed dangling mass, reimplemented independently in
    dense numpy; a spam island unreachable from any seed must converge to
    exactly 0 while total trust stays 1."""
    import numpy as np

    from delphi_crawler_spark.operators.graph import trust_rank

    rng = random.Random(7)
    n = 24
    # main component: nodes 0..17 (seeds 0..3); spam island: 18..23 only
    # links among itself, nothing from the main component points in.
    edges = []
    for _ in range(80):
        u, v = rng.randrange(18), rng.randrange(18)
        if u != v:
            edges.append((u, v, float(rng.randrange(1, 4))))
    for _ in range(20):
        u, v = 18 + rng.randrange(6), 18 + rng.randrange(6)
        if u != v:
            edges.append((u, v, 1.0))
    df = spark.createDataFrame(edges, "src: long, dst: long, w: double")
    seeds = spark.createDataFrame([(i,) for i in range(4)], "node: long")
    got = {
        r["node"]: r["trust"]
        for r in trust_rank(df, seeds, weight="w", iters=6).collect()
    }

    nodes = sorted({u for u, v, _ in edges} | {v for _, v, _ in edges})
    idx = {x: i for i, x in enumerate(nodes)}
    m = len(nodes)
    W = np.zeros((m, m))
    for u, v, w in edges:
        W[idx[u], idx[v]] += w
    outw = W.sum(axis=1)
    has_out = outw > 0
    P = np.divide(W, outw[:, None], out=np.zeros_like(W), where=has_out[:, None])
    seed_ids = [x for x in nodes if x < 4]
    sv = np.zeros(m)
    for x in seed_ids:
        sv[idx[x]] = 1.0 / len(seed_ids)
    d, t = 0.85, sv.copy()
    for _ in range(6):
        dangling = t[~has_out].sum()
        t = (1.0 - d) * sv + d * (t @ P + dangling * sv)
    for x in nodes:
        assert abs(got[x] - t[idx[x]]) < 1e-9
    assert abs(sum(got.values()) - 1.0) < 1e-9
    for x in nodes:
        if x >= 18:  # spam island: zero trust, exactly
            assert got[x] == 0.0


def test_trust_rank_requires_seed_in_graph(spark):
    edges = spark.createDataFrame([(0, 1)], "src: long, dst: long")
    seeds = spark.createDataFrame([(99,)], "node: long")
    with pytest.raises(ValueError, match="seed"):
        from delphi_crawler_spark.operators.graph import trust_rank

        trust_rank(edges, seeds)


def test_discovery_depth_matches_independent_bfs(spark):
    """Frontier BFS vs an independent Python deque BFS on a random digraph:
    same (node, min-depth) map, unreachable nodes absent, cap respected."""
    from collections import deque

    from delphi_crawler_spark.operators.graph import discovery_depth

    rng = random.Random(31)
    n = 40
    edges = list({(rng.randrange(n), rng.randrange(n)) for _ in range(70)})
    edges = [(u, v) for u, v in edges if u != v]
    seed_ids = [0, 1]
    cap = 6

    adj: dict[int, list[int]] = {}
    for u, v in edges:
        adj.setdefault(u, []).append(v)
    want: dict[int, int] = {s: 0 for s in seed_ids}
    q = deque(seed_ids)
    while q:
        u = q.popleft()
        if want[u] >= cap:
            continue
        for v in adj.get(u, ()):
            if v not in want:
                want[v] = want[u] + 1
                q.append(v)

    df = spark.createDataFrame(edges, "src: long, dst: long")
    seeds = spark.createDataFrame([(s,) for s in seed_ids], "node: long")
    got = {
        r["node"]: r["depth"]
        for r in discovery_depth(df, seeds, max_depth=cap).collect()
    }
    assert got == want


def test_discovery_depth_early_exit_and_cap(spark):
    """A 3-chain exhausts in 3 rounds regardless of a larger cap (early
    exit), and a small cap truncates the reachable set."""
    from delphi_crawler_spark.operators.graph import discovery_depth

    chain = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "src: long, dst: long"
    )
    seeds = spark.createDataFrame([(0,)], "node: long")
    full = {
        r["node"]: r["depth"]
        for r in discovery_depth(chain, seeds, max_depth=50).collect()
    }
    assert full == {0: 0, 1: 1, 2: 2, 3: 3}
    capped = {
        r["node"]: r["depth"]
        for r in discovery_depth(chain, seeds, max_depth=2).collect()
    }
    assert capped == {0: 0, 1: 1, 2: 2}


def test_label_propagation_matches_independent_python(spark):
    """Synchronous LPA with (count DESC, label ASC) tie-break, replicated
    independently with dict loops over the symmetrized self-loop-free
    edge set."""
    from collections import Counter

    from delphi_crawler_spark.operators.graph import label_propagation

    # two triangles bridged by one edge, a dangling pendant, a self-loop,
    # and a duplicated directed edge (exercises distinct + symmetrize)
    raw = [
        ("a1", "a2"), ("a2", "a3"), ("a3", "a1"),
        ("b1", "b2"), ("b2", "b3"), ("b3", "b1"),
        ("a3", "b1"), ("b3", "c1"), ("c1", "c1"), ("a1", "a2"),
        ("a2", "a1"),
    ]
    iters = 3
    adj: dict[str, set] = {}
    for s, d in raw:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    labels = {n: n for n in adj}
    for _ in range(iters):
        nxt = {}
        for n, nbrs in adj.items():
            cnt = Counter(labels[m] for m in nbrs)
            nxt[n] = min(
                cnt, key=lambda lbl: (-cnt[lbl], lbl)
            )
        labels = nxt

    df = spark.createDataFrame(raw, "src: string, dst: string")
    got = {
        r["node"]: r["label"]
        for r in label_propagation(df, iters=iters).collect()
    }
    assert got == labels
    # the bridge does not merge the triangles into one community
    assert len({got["a1"], got["a2"], got["a3"]} & {got["b1"], got["b2"]}) == 0


def test_label_propagation_validates_iters(spark):
    import pytest as _pytest

    from delphi_crawler_spark.operators.graph import label_propagation

    df = spark.createDataFrame([("x", "y")], "src: string, dst: string")
    with _pytest.raises(ValueError):
        label_propagation(df, iters=0)


def test_opic_cash_invariant_and_hand_computed(spark):
    """OPIC invariants: total cash stays 1 every round (so importance sums
    to 1), and a hand-computed 3-node chain matches exactly."""
    from delphi_crawler_spark.operators.graph import opic_importance

    # a -> b -> c, c dangling; n=3
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c")], ["src", "dst"]
    )
    out = {r["node"]: r for r in opic_importance(edges, iters=2).collect()}
    # round 1: cash a=1/9 (c's 1/3 dangling /3), b=1/3+1/9, c=1/3+1/9
    #          hist all 1/3
    # round 2: dangling = c = 4/9 -> each gets 4/27
    #   a = 4/27; b = a_cash(1/9) + 4/27; c = b_cash(4/9) + 4/27
    #   hist: a=1/3+1/9, b=1/3+4/9, c=1/3+4/9
    exp = {
        "a": (4 / 27, 1 / 3 + 1 / 9),
        "b": (1 / 9 + 4 / 27, 1 / 3 + 4 / 9),
        "c": (4 / 9 + 4 / 27, 1 / 3 + 4 / 9),
    }
    for node, (cash, hist) in exp.items():
        assert abs(out[node]["cash"] - cash) < 1e-12, node
        assert abs(out[node]["history"] - hist) < 1e-12, node
        assert abs(out[node]["importance"] - (cash + hist) / 3) < 1e-12, node
    assert abs(sum(r["cash"] for r in out.values()) - 1.0) < 1e-12
    assert abs(sum(r["importance"] for r in out.values()) - 1.0) < 1e-12

    import pytest as _pytest

    with _pytest.raises(ValueError):
        opic_importance(edges, iters=0)


def test_neighborhood_function_hand_graph(spark):
    """Exact N(t) on a 4-chain a->b->c->d: N(0)=4 (self pairs), N(1)=7,
    N(2)=9, N(3)=10; effective diameter at 0.9 is 2 (9 >= 0.9*10)."""
    from delphi_crawler_spark.operators.graph import neighborhood_function

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], ["src", "dst"]
    )
    rows = {r["t"]: r for r in neighborhood_function(edges, max_t=3).collect()}
    assert [rows[t]["n_pairs"] for t in range(4)] == [4, 7, 9, 10]
    assert rows[3]["frac"] == 1.0
    assert abs(rows[1]["frac"] - 0.7) < 1e-12
    assert all(rows[t]["eff_diameter"] == 2 for t in range(4))


def test_neighborhood_function_validates_and_dedups(spark):
    """Duplicate and reverse edges do not change the closure; max_t < 1 is
    rejected loudly."""
    import pytest as _pytest

    from delphi_crawler_spark.operators.graph import neighborhood_function

    edges = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("b", "a")], ["src", "dst"]
    )
    rows = {r["t"]: r for r in neighborhood_function(edges, max_t=2).collect()}
    # directed closure: {aa, bb} then + {ab, ba}; t=2 adds nothing new
    assert [rows[t]["n_pairs"] for t in range(3)] == [2, 4, 4]
    with _pytest.raises(ValueError):
        neighborhood_function(edges, max_t=0)


def test_hyperanf_tracks_exact_neighborhood(spark):
    """HyperANF estimates stay within the p=12 error envelope (~5%) of the
    exact neighborhood function on a ~120-node host graph, and the run is
    deterministic (xxhash64 node hashing, no rng)."""
    from delphi_crawler_spark.operators.graph import (
        hyperanf_neighborhood,
        neighborhood_function,
    )

    # two rings bridged at one point: distances actually grow with t
    edges = [(f"h{i}", f"h{(i + 1) % 60}") for i in range(60)]
    edges += [(f"g{i}", f"g{(i + 1) % 60}") for i in range(60)]
    edges.append(("h0", "g0"))
    e = spark.createDataFrame(edges, ["src", "dst"])
    exact = {r["t"]: r["n_pairs"] for r in neighborhood_function(e, max_t=3).collect()}
    est1 = {r["t"]: r["est_pairs"] for r in hyperanf_neighborhood(e, max_t=3, p=12).collect()}
    est2 = {r["t"]: r["est_pairs"] for r in hyperanf_neighborhood(e, max_t=3, p=12).collect()}
    assert est1 == est2  # bit-identical across runs
    for t in range(4):
        assert abs(est1[t] - exact[t]) / exact[t] < 0.05, (t, est1[t], exact[t])
    # monotone in t (register max-merge can only grow estimates)
    assert est1[0] <= est1[1] <= est1[2] <= est1[3]


def test_graph_structure_stats_hand_built(spark):
    """2-cycle + chain: reciprocity counts both directions of the cycle;
    assortativity matches the hand OLS; self-loops and duplicate edges
    are ignored."""
    from delphi_crawler_spark.operators.graph import graph_structure_stats

    edges = spark.createDataFrame(
        [
            ("a", "b"), ("b", "a"),          # reciprocal pair
            ("a", "c"), ("c", "d"),          # chain
            ("a", "c"),                      # duplicate (ignored)
            ("d", "d"),                      # self-loop (ignored)
        ],
        ["src", "dst"],
    )
    r = graph_structure_stats(edges).collect()[0]
    assert r["n_nodes"] == 4 and r["n_edges"] == 4
    assert r["n_reciprocal"] == 2 and r["reciprocity"] == 0.5
    # edge (u,v) -> (outdeg u, indeg v): ab:(2,1) ba:(1,1) ac:(2,1) cd:(1,1)
    xs, ys = [2, 1, 2, 1], [1, 1, 1, 1]
    # indegree is constant -> zero variance -> NULL assortativity
    assert r["assortativity"] is None

    tri = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")], ["src", "dst"]
    )
    r2 = graph_structure_stats(tri).collect()[0]
    # pairs: ab:(2,1) bc:(1,2) ca:(1,1) ac:(2,2)
    import math

    xs, ys = [2, 1, 1, 2], [1, 2, 1, 2]
    m = 4.0
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx, syy = sum(a * a for a in xs), sum(b * b for b in ys)
    exp = (m * sxy - sx * sy) / (
        math.sqrt(m * sxx - sx * sx) * math.sqrt(m * syy - sy * sy)
    )
    assert abs(r2["assortativity"] - round(exp, 6)) < 1e-9
    assert r2["n_reciprocal"] == 2  # c->a and a->c


def test_random_walks_deterministic_and_terminating(spark):
    """Walks are pure functions of the edge set (two runs identical, any
    partitioning); a sink terminates its walk early; a cycle walks full
    length; every step follows an existing edge."""
    from delphi_crawler_spark.operators.graph import deterministic_random_walks

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("x", "y")],
        ["src", "dst"],
    )
    r1 = deterministic_random_walks(edges, walk_len=3)
    rows1 = sorted((r["start"], r["step"], r["node"]) for r in r1.collect())
    r2 = deterministic_random_walks(edges.repartition(7), walk_len=3)
    rows2 = sorted((r["start"], r["step"], r["node"]) for r in r2.collect())
    assert rows1 == rows2
    # y is a sink: its walk is just step 0
    ys = [t for t in rows1 if t[0] == "y"]
    assert ys == [("y", 0, "y")]
    # x reaches y at step 1 then stops
    xs = {t[1]: t[2] for t in rows1 if t[0] == "x"}
    assert xs == {0: "x", 1: "y"}
    # a/b/c live in a cycle: full-length walks
    for s in ("a", "b", "c"):
        assert len([t for t in rows1 if t[0] == s]) == 4
    # each transition uses a real edge
    eset = {("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("x", "y")}
    bywalk = {}
    for st, step, node in rows1:
        bywalk.setdefault(st, {})[step] = node
    for st, seq in bywalk.items():
        for i in range(1, max(seq) + 1):
            assert (seq[i - 1], seq[i]) in eset

    import pytest as _p

    with _p.raises(ValueError):
        deterministic_random_walks(edges, walk_len=0)


def test_modularity_two_cliques_vs_random(spark):
    """Two disjoint triangles with perfect communities score the textbook
    Q = 0.5; merging everything into one community scores 0; a perfect
    split of a single clique scores 0 too (no structure to reward)."""
    from delphi_crawler_spark.operators.graph import modularity_score

    tri1 = [("a", "b"), ("b", "c"), ("c", "a")]
    tri2 = [("x", "y"), ("y", "z"), ("z", "x")]
    edges = spark.createDataFrame(tri1 + tri2, ["src", "dst"])
    good = spark.createDataFrame(
        [("a", 1), ("b", 1), ("c", 1), ("x", 2), ("y", 2), ("z", 2)],
        ["node", "label"],
    )
    r = modularity_score(edges, good).collect()[0]
    # per clique: m_c/m = 3/6, (d_c/2m)^2 = (6/12)^2 -> 0.5 - 0.25 = 0.25 x2
    assert r["modularity"] == 0.5
    assert r["n_communities"] == 2 and r["n_edges"] == 6

    allone = spark.createDataFrame(
        [(n, 9) for n in "abcxyz"], ["node", "label"]
    )
    r2 = modularity_score(edges, allone).collect()[0]
    assert r2["modularity"] == 0.0


def test_cocitation_hand_built_and_hub_cap(spark):
    """a and b share 2 of 3 targets -> jaccard 2/4; the mega-hub target
    is capped out of pair generation but stays in the degrees."""
    from delphi_crawler_spark.operators.graph import cocitation_similarity

    edges = [
        ("a", "t1"), ("a", "t2"), ("a", "hub"),
        ("b", "t1"), ("b", "t2"), ("b", "hub"),
        ("c", "t9"), ("c", "hub"),
    ]
    df = spark.createDataFrame(edges, ["src", "dst"])
    out = cocitation_similarity(df, min_shared=2, max_target_indegree=2).collect()
    got = {(r["src_a"], r["src_b"]): r for r in out}
    # hub has indegree 3 > 2: capped. a-b share t1,t2 -> 2 shared;
    # degrees stay 3 and 3 -> jaccard 2/(3+3-2) = 0.5
    assert set(got) == {("a", "b")}
    r = got[("a", "b")]
    assert r["n_shared"] == 2 and r["deg_a"] == 3 and r["deg_b"] == 3
    assert r["jaccard"] == 0.5
    # without the cap, c pairs with a and b through the hub only (1 shared
    # each) and still falls below min_shared
    out2 = cocitation_similarity(df, min_shared=1, max_target_indegree=10).collect()
    keys2 = {(r["src_a"], r["src_b"]) for r in out2}
    assert ("a", "c") in keys2 and ("b", "c") in keys2
