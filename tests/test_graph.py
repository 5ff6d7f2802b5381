"""Link-graph analytics (analytics/graph.py): PageRank against a tiny
numpy reference loop (incl. dangling-mass redistribution and isolated
nodes), BFS depths against hand-computed layers."""

import numpy as np
import pytest

from spider_spark.analytics import graph


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["src", "dst"])


def _ref_pagerank(n, edges, iterations=5, damping=0.85):
    """Dense reference: edges as (src_idx, dst_idx) pairs, parallel
    edges counted, dangling mass spread uniformly."""
    out_deg = np.zeros(n)
    for s, _ in edges:
        out_deg[s] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iterations):
        nxt = np.full(n, (1.0 - damping) / n)
        dangling = r[out_deg == 0].sum()
        nxt += damping * dangling / n
        for s, d in edges:
            nxt[d] += damping * r[s] / out_deg[s]
        r = nxt
    return r


def test_pagerank_matches_reference_with_dangling(spark):
    # a->b, a->c, b->c; c dangling; d isolated (only via nodes frame)
    names = ["a", "b", "c", "d"]
    idx_edges = [(0, 1), (0, 2), (1, 2)]
    e = _edges(spark, [(names[s], names[d]) for s, d in idx_edges])
    nodes = spark.createDataFrame([(x,) for x in names], ["node"])
    got = {r["node"]: r["rank"]
           for r in graph.pagerank(e, nodes, iterations=5).collect()}
    want = _ref_pagerank(4, idx_edges, iterations=5)
    assert set(got) == set(names)
    for i, nm in enumerate(names):
        assert got[nm] == pytest.approx(want[i], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_parallel_edges_weight_double(spark):
    # a emits two parallel edges to b and one to c: b receives 2/3 of
    # a's damped mass, c 1/3
    e = _edges(spark, [("a", "b"), ("a", "b"), ("a", "c"),
                       ("b", "a"), ("c", "a")])
    got = {r["node"]: r["rank"]
           for r in graph.pagerank(e, iterations=1).collect()}
    third = 1.0 / 3
    assert got["b"] == pytest.approx(0.05 + 0.85 * third * 2 / 3, abs=1e-12)
    assert got["c"] == pytest.approx(0.05 + 0.85 * third * 1 / 3, abs=1e-12)


def test_pagerank_ranks_sum_to_one(spark):
    # ring + chord graph, no dangling
    pairs = [(f"n{i}", f"n{(i + 1) % 7}") for i in range(7)]
    pairs += [(f"n{i}", f"n{(i + 3) % 7}") for i in range(7)]
    got = graph.pagerank(_edges(spark, pairs), iterations=8).collect()
    assert sum(r["rank"] for r in got) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_no_dangling_fastpath_identical(spark):
    # ring graph (no dangling): skipping the dangling branch must give
    # bit-identical ranks
    pairs = [(f"n{i}", f"n{(i + 1) % 5}") for i in range(5)]
    pairs += [(f"n{i}", f"n{(i + 2) % 5}") for i in range(5)]
    e = _edges(spark, pairs)
    full = {r["node"]: r["rank"]
            for r in graph.pagerank(e, iterations=4).collect()}
    fast = {r["node"]: r["rank"]
            for r in graph.pagerank(e, iterations=4,
                                    assume_no_dangling=True).collect()}
    assert full == fast


def test_bfs_depths_layers_and_min_over_paths(spark):
    # chain a->b->c->d plus shortcut a->c: c is depth 1, not 2;
    # d at depth 2; e unreachable
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"),
                       ("e", "e")])
    seeds = spark.createDataFrame([("a",)], ["node"])
    got = {r["node"]: r["depth"]
           for r in graph.bfs_depths(e, seeds, max_depth=3).collect()}
    assert got == {"a": 0, "b": 1, "c": 1, "d": 2}


def test_bfs_depth_cap_excludes_deeper_nodes(spark):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    seeds = spark.createDataFrame([("a",)], ["node"])
    got = {r["node"]: r["depth"]
           for r in graph.bfs_depths(e, seeds, max_depth=2).collect()}
    assert got == {"a": 0, "b": 1, "c": 2}


def _ref_hits(nodes, edges, iterations=2):
    """Dense reference: unnormalized power iteration with hub0 = 1,
    one final max-division — mirrors graph.hits' contract."""
    idx = {n: i for i, n in enumerate(nodes)}
    hub = np.ones(len(nodes))
    auth = np.zeros(len(nodes))
    for _ in range(iterations):
        auth = np.zeros(len(nodes))
        for s, d in edges:
            auth[idx[d]] += hub[idx[s]]
        hub = np.zeros(len(nodes))
        for s, d in edges:
            hub[idx[s]] += auth[idx[d]]
    return (auth / max(auth.max(), 1.0), hub / max(hub.max(), 1.0))


def test_hits_matches_dense_reference(spark):
    # two hubs pointing at a shared authority plus a chain tail;
    # includes a parallel edge (counted twice) and a pure-sink node
    pairs = [("h1", "x"), ("h1", "x"), ("h1", "y"), ("h2", "x"),
             ("h2", "z"), ("y", "z")]
    nodes = ["h1", "h2", "x", "y", "z"]
    e = _edges(spark, pairs)
    want_auth, want_hub = _ref_hits(nodes, pairs)
    got = {r["node"]: (r["auth"], r["hub"])
           for r in graph.hits(e, iterations=2).collect()}
    assert set(got) == set(nodes)
    for i, n in enumerate(nodes):
        assert got[n][0] == pytest.approx(want_auth[i], abs=1e-12)
        assert got[n][1] == pytest.approx(want_hub[i], abs=1e-12)


def test_hits_empty_graph_all_zero(spark):
    e = _edges(spark, [("a", "b")]).filter("src = 'never'")
    assert graph.hits(e, iterations=2).collect() == []


def _ref_opic(n, edges, iterations, cash0):
    """Dense reference of the synchronous OPIC rounds: cash banks into
    history, then flows uniformly over out-edges; dangling outflow
    evaporates (graph.opic's documented contract)."""
    out_deg = np.zeros(n)
    for s, _ in edges:
        out_deg[s] += 1
    cash = np.full(n, float(cash0))
    hist = np.zeros(n)
    for _ in range(iterations):
        nxt = np.zeros(n)
        for s, d in edges:
            nxt[d] += cash[s] / out_deg[s]
        hist += cash
        cash = nxt
    return hist, cash


def test_opic_matches_dense_reference_with_dangling(spark):
    # a->b, a->c, b->c; c dangling (its cash evaporates)
    names = ["a", "b", "c"]
    idx_edges = [(0, 1), (0, 2), (1, 2)]
    hist, cash = _ref_opic(3, idx_edges, iterations=3, cash0=8.0)
    rows = graph.opic(
        _edges(spark, [(names[s], names[d]) for s, d in idx_edges]),
        iterations=3, cash0=8.0,
    ).collect()
    got = {r["node"]: (r["history"], r["cash"]) for r in rows}
    for i, nm in enumerate(names):
        assert got[nm][0] == pytest.approx(hist[i], abs=1e-12)
        assert got[nm][1] == pytest.approx(cash[i], abs=1e-12)


def test_opic_conserves_cash_without_dangling(spark):
    # 2-cycle plus a chord: every node has out-edges, so total
    # history+cash is exactly (k+1) * cash0 * n and every intermediate
    # value is an exact integer when cash0 = max_outdeg^k
    pairs = [("a", "b"), ("b", "a"), ("a", "c"), ("c", "a")]
    k = 3
    rows = graph.opic(_edges(spark, pairs), iterations=k, cash0=2.0 ** k).collect()
    total = sum(r["history"] + r["cash"] for r in rows)
    assert total == (k + 1) * 2.0 ** k * 3
    for r in rows:
        assert r["history"] == int(r["history"])
        assert r["cash"] == int(r["cash"])


def _ref_trustrank(n, idx_edges, seeds, iterations, damping=0.85):
    out = [[] for _ in range(n)]
    for s, d in idx_edges:
        out[s].append(d)
    d0 = [1.0 / len(seeds) if i in seeds else 0.0 for i in range(n)]
    t = list(d0)
    for _ in range(iterations):
        nxt = [(1.0 - damping) * d0[i] for i in range(n)]
        for s in range(n):
            if out[s]:
                share = damping * t[s] / len(out[s])
                for d in out[s]:
                    nxt[d] += share
        t = nxt
    return t


def test_trustrank_matches_dense_reference(spark):
    names = ["a", "b", "c", "d"]
    idx_edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 0)]
    ref = _ref_trustrank(4, idx_edges, seeds={0}, iterations=3)
    rows = graph.trustrank(
        _edges(spark, [(names[s], names[d]) for s, d in idx_edges]),
        spark.createDataFrame([("a",)], ["node"]),
        iterations=3,
    ).collect()
    got = {r["node"]: r["trust"] for r in rows}
    for i, nm in enumerate(names):
        assert got[nm] == pytest.approx(ref[i], abs=1e-12)


def test_trustrank_mass_conserved_and_seed_floor(spark):
    # no dangling nodes -> total trust stays exactly 1 per iteration;
    # every seed keeps at least the teleport floor (1-d)/|S|
    pairs = [("a", "b"), ("b", "c"), ("c", "a")]
    seeds = spark.createDataFrame([("a",), ("b",)], ["node"])
    rows = graph.trustrank(_edges(spark, pairs), seeds,
                           iterations=4).collect()
    got = {r["node"]: r["trust"] for r in rows}
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-12)
    assert got["a"] >= 0.15 / 2 - 1e-12
    assert got["b"] >= 0.15 / 2 - 1e-12


def test_trustrank_empty_seeds_and_nodes_paths(spark):
    pairs = [("a", "b"), ("b", "a")]
    empty = spark.createDataFrame([], "node string")
    rows = graph.trustrank(_edges(spark, pairs), empty, iterations=2).collect()
    assert {tuple(r) for r in rows} == {("a", 0.0), ("b", 0.0)}
    # caller-supplied nodes frame == derived-nodes result
    seeds = spark.createDataFrame([("a",)], ["node"])
    nodes = spark.createDataFrame([("a",), ("b",)], ["node"])
    derived = {tuple(r) for r in graph.trustrank(
        _edges(spark, pairs), seeds, iterations=2).collect()}
    supplied = {tuple(r) for r in graph.trustrank(
        _edges(spark, pairs), seeds, iterations=2, nodes=nodes,
        assume_unique=True).collect()}
    assert derived == supplied
