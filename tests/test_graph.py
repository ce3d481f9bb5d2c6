"""Graph-family tests: triangle census on a hand-checkable graph,
PageRank vs a dense numpy replica, degree histogram consistency.

The oracle gate already pins q_graph_degree_histogram and
q_triangle_count value-exactly against DuckDB at sf0.01; these tests
pin the ALGORITHMS on graphs small enough to verify by hand, and the
iterative path (q_pagerank, rows-only at the driver) against an
independent dense-matrix implementation.
"""

from __future__ import annotations

import pytest

from datapoints_csv_extractor_spark.operators import graph as G

SF = "/root/testdata/sf0.001"


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in pairs], "p1 long, p2 long"
    )


def test_triangle_census_on_known_graph(spark):
    # K4 on {1,2,3,4} (4 triangles) plus a pendant path 4-5-6
    # (0 triangles) and an isolated edge 7-8.
    pairs = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
        (4, 5), (5, 6), (7, 8),
    ]
    row = G.triangle_census(_edges_df(spark, pairs)).collect()[0]
    assert row.n_nodes == 8
    assert row.n_edges == 9
    assert row.n_triangles == 4
    # Wedges: deg = {1:3, 2:3, 3:3, 4:4, 5:2, 6:1, 7:1, 8:1}
    # sum C(d,2) = 3+3+3+6+1+0+0+0 = 16
    assert row.n_wedges == 16
    assert row.clustering_coefficient == pytest.approx(12 / 16, abs=1e-6)


def test_triangle_census_counts_each_triangle_once_under_ties(spark):
    # A triangle with all-equal degrees: orientation must fall back
    # to the id tie-break and still count exactly one triangle.
    row = G.triangle_census(
        _edges_df(spark, [(10, 20), (20, 30), (10, 30)])
    ).collect()[0]
    assert row.n_triangles == 1
    assert row.clustering_coefficient == pytest.approx(1.0, abs=1e-6)


def test_degree_histogram_mass_matches_edge_count(spark):
    # sum(degree * n_nodes) == 2 * |E| on the real testdata graph.
    hist = G.q_graph_degree_histogram(spark, SF).collect()
    n_edges = G.co_order_edges(spark, SF).count()
    assert sum(r.degree * r.n_nodes for r in hist) == 2 * n_edges


def test_pagerank_matches_numpy_replica(spark):
    pairs = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
        (4, 5), (5, 6), (7, 8),
    ]
    got = {
        r.node: r.rank
        for r in G.pagerank(_edges_df(spark, pairs)).collect()
    }

    import numpy as np

    nodes = sorted({n for p in pairs for n in p})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    adj = np.zeros((n, n))
    for a, b in pairs:
        adj[idx[a], idx[b]] = 1.0
        adj[idx[b], idx[a]] = 1.0
    out_deg = adj.sum(axis=1)
    r = np.full(n, 1.0 / n)
    for _ in range(10):
        contrib = adj.T @ (r / out_deg)
        r = (1.0 - 0.85) / n + 0.85 * contrib
    for node in nodes:
        assert got[node] == pytest.approx(r[idx[node]], rel=1e-9), node
    # Symmetric structure: {1,2,3} are automorphic, so equal-ranked.
    assert got[1] == pytest.approx(got[2], rel=1e-12)
    assert got[2] == pytest.approx(got[3], rel=1e-12)


def test_pagerank_ranks_sum_to_one(spark):
    ranks = G.pagerank(G.co_order_edges(spark, SF))
    total = ranks.groupBy().sum("rank").collect()[0][0]
    assert total == pytest.approx(1.0, abs=1e-9)


def test_q_pagerank_is_deterministic_across_runs(spark):
    a = [tuple(r) for r in G.q_pagerank(spark, SF, top_k=20).collect()]
    b = [tuple(r) for r in G.q_pagerank(spark, SF, top_k=20).collect()]
    assert a == b


def test_kcore_on_known_graph(spark):
    # K4 plus a pendant path: the 3-core is exactly the K4; the
    # 4-core is empty.
    pairs = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
        (4, 5), (5, 6), (7, 8),
    ]
    core3 = G.kcore(_edges_df(spark, pairs), 3).collect()
    assert {r.node for r in core3} == {1, 2, 3, 4}
    assert all(r.degree == 3 for r in core3)
    assert G.kcore(_edges_df(spark, pairs), 4).count() == 0
    # An exhausted explicit round budget RAISES (a partial peel is not
    # a k-core) instead of silently returning whatever remained.
    with pytest.raises(RuntimeError, match="fixpoint"):
        G.kcore(_edges_df(spark, pairs), 3, max_iterations=1)


def test_kcore_matches_python_peeler(spark):
    from collections import defaultdict

    edges = [(r.p1, r.p2) for r in G.co_order_edges(spark, SF).collect()]
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)

    k = 10
    deg = {n: len(s) for n, s in adj.items()}
    alive = set(deg)
    while True:
        drop = [n for n in alive if deg[n] < k]
        if not drop:
            break
        for n in drop:
            alive.discard(n)
            for m in adj[n]:
                if m in alive:
                    deg[m] -= 1
    got = {r.l_partkey: r.core_degree for r in G.q_kcore(spark, SF, k=k).collect()}
    assert set(got) == alive
    for n in alive:
        assert got[n] == deg[n], n


def test_kcore_semi_and_anti_filter_branches_agree(spark):
    # The per-round edge filter has two result-identical forms: the
    # broadcast anti-join on the (small) dropped set (default) and the
    # shuffled semi-join on keep (the fallback when a round drops more
    # than KCORE_BROADCAST_DROP_MAX nodes). Forcing the fallback via
    # the threshold must peel the identical core.
    pairs = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
        (4, 5), (5, 6), (6, 7), (7, 8), (2, 8),
    ]
    want = sorted(
        (r.node, r.degree)
        for r in G.kcore(_edges_df(spark, pairs), 3).collect()
    )
    cap = G.KCORE_BROADCAST_DROP_MAX
    try:
        G.KCORE_BROADCAST_DROP_MAX = -1  # every round takes the semi-join
        got = sorted(
            (r.node, r.degree)
            for r in G.kcore(_edges_df(spark, pairs), 3).collect()
        )
    finally:
        G.KCORE_BROADCAST_DROP_MAX = cap
    assert got == want and want  # non-vacuous: the 3-core is K4


def test_bfs_distances_on_known_graph(spark):
    # Path 1-2-3-4-5 plus an unreachable component {8,9}: distances
    # from seed 1 bound at 3 hops; 5 and the island never appear.
    pairs = [(1, 2), (2, 3), (3, 4), (4, 5), (8, 9)]
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {
        r.node: r.dist
        for r in G.bfs_distances(_edges_df(spark, pairs), seeds, 3).collect()
    }
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}
    # Early frontier exhaustion: the island seed stops after one hop.
    got2 = {
        r.node: r.dist
        for r in G.bfs_distances(
            _edges_df(spark, pairs),
            spark.createDataFrame([(8,)], "node long"),
            10,
        ).collect()
    }
    assert got2 == {8: 0, 9: 1}
    # Multi-source: nearest seed wins.
    got3 = {
        r.node: r.dist
        for r in G.bfs_distances(
            _edges_df(spark, pairs),
            spark.createDataFrame([(1,), (5,)], "node long"),
            3,
        ).collect()
    }
    assert got3 == {1: 0, 5: 0, 2: 1, 4: 1, 3: 2}


def test_sssp_matches_python_bellman_ford(spark):
    """Weighted bounded-hop distances must equal the textbook DP
    dist_k(v) = min(dist_{k-1}(v), min over (u,v) dist_{k-1}(u)+w)
    computed in pure Python — on a hand graph AND on the real
    co-purchase weights."""
    # Hand graph: direct edge 1-3 (w 5.0) loses to the 2-hop path
    # through 2 (1+1); hop bound 1 must NOT see the cheaper path yet.
    pairs = [(1, 2, 1.0), (2, 3, 1.0), (1, 3, 5.0), (8, 9, 2.0)]
    edges = spark.createDataFrame(pairs, "p1 long, p2 long, weight double")
    seeds = spark.createDataFrame([(1,)], "node long")
    one = {
        r.node: r.dist
        for r in G.sssp_distances(edges, seeds, max_hops=1).collect()
    }
    assert one == {1: 0.0, 2: 1.0, 3: 5.0}
    two = {
        r.node: r.dist
        for r in G.sssp_distances(edges, seeds, max_hops=2).collect()
    }
    assert two == {1: 0.0, 2: 1.0, 3: 2.0}

    # Real graph vs the DP replica.
    max_hops, n_seeds = 3, 3
    rows = G.co_order_weighted_edges(spark, SF).collect()
    adj = {}
    for r in rows:
        adj.setdefault(r.p1, []).append((r.p2, r.weight))
        adj.setdefault(r.p2, []).append((r.p1, r.weight))
    seeds_py = sorted(adj)[:n_seeds]
    dist = {s: 0.0 for s in seeds_py}
    for _ in range(max_hops):
        nxt = dict(dist)
        for u, du in dist.items():
            for v, w in adj[u]:
                if v not in nxt or du + w < nxt[v]:
                    nxt[v] = du + w
        dist = nxt
    got = {
        r.l_partkey: r.affinity_dist
        for r in G.q_sssp_weighted(spark, SF, n_seeds, max_hops).collect()
    }
    assert set(got) == set(dist)
    for n, d in dist.items():
        assert got[n] == round(d, 9), n


def test_hits_pages_matches_numpy_power_iteration(spark):
    """q_hits_pages vs a numpy replica running the SAME schedule
    (8 rounds, renormalize every 4th + final): scores agree to 1e-6
    and hub/authority rankings are identical."""
    import numpy as np

    from datapoints_csv_extractor_spark.operators.curation import (
        extract_links,
        link_pages,
    )
    from datapoints_csv_extractor_spark.operators.graph import q_hits_pages

    sf = "/root/testdata/sf0.001"
    got = q_hits_pages(spark, sf, top_k=1000).collect()

    edges = (
        extract_links(link_pages(spark, sf), "html", "url")
        .where("url != link")
        .selectExpr("url AS src", "link AS dst")
        .distinct()
        .collect()
    )
    nodes = sorted({e.src for e in edges} | {e.dst for e in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    a_mat = np.zeros((len(nodes), len(nodes)))
    for e in edges:
        a_mat[idx[e.src], idx[e.dst]] = 1.0
    hub = np.ones(len(nodes))
    auth = np.ones(len(nodes))
    for i in range(8):
        auth = a_mat.T @ hub
        hub = a_mat @ auth
        if (i + 1) % 4 == 0 and i + 1 < 8:
            auth /= np.linalg.norm(auth)
            hub /= np.linalg.norm(hub)
    auth /= np.linalg.norm(auth)
    hub /= np.linalg.norm(hub)

    assert len(got) == len(nodes)
    ref = {n: (h, a) for n, h, a in zip(nodes, hub, auth)}
    for row in got:
        h, a = ref[row.url]
        assert abs(row.hub - h) < 1e-6
        assert abs(row.authority - a) < 1e-6
    # Ordering is by the ROUNDED authority (ties -> url): re-derive
    # it from the operator's own displayed values.
    assert [r.url for r in got] == [
        r.url for r in sorted(got, key=lambda r: (-r.authority, r.url))
    ]


def test_label_propagation_on_known_graph(spark):
    # Two triangles bridged by one edge: {1,2,3} and {4,5,6} with
    # bridge 3-4. Min-tie-break synchronous LPA: round 1 gives every
    # node the smallest neighbor label (1->2? no: neighbors of 1 are
    # {2,3}, all labels distinct, tie -> min = 2)... verified against
    # the replica below; the structural assertion is that the two
    # triangle cores end in different communities.
    pairs = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
    got = {
        r.node: r.community
        for r in G.label_propagation(_edges_df(spark, pairs), rounds=4)
        .collect()
    }
    assert got == _lpa_replica(pairs, rounds=4)
    assert got[1] == got[2]
    assert got[5] == got[6]
    assert got[1] != got[5]


def _lpa_replica(pairs, rounds):
    import collections

    adj = collections.defaultdict(list)
    for a, b in pairs:
        adj[a].append(b)
        adj[b].append(a)
    lab = {v: v for v in adj}
    for _ in range(rounds):
        new = {}
        for v in adj:
            c = collections.Counter(lab[u] for u in adj[v])
            mx = max(c.values())
            new[v] = min(x for x, n in c.items() if n == mx)
        lab = new
    return lab


def test_lpa_matches_python_replica_on_testdata(spark):
    edges = G.affinity_edges(spark, SF)
    pairs = [(r.p1, r.p2) for r in edges.collect()]
    got = {
        r.node: r.community
        for r in G.label_propagation(edges, rounds=4).collect()
    }
    assert got == _lpa_replica(pairs, rounds=4)


def test_modularity_on_known_partition(spark):
    # Two disjoint triangles, each its own community: m=6, per
    # community e_c=3, D_c=6 -> Q = 2*(3/6 - (6/12)^2) = 0.5.
    pairs = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6)]
    edges = _edges_df(spark, pairs)
    assign = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (6, 4)],
        "node long, community long",
    )
    row = G.modularity(edges, assign).collect()[0]
    assert row.n_communities == 2
    assert row.n_edges == 6
    assert row.modularity == pytest.approx(0.5, abs=1e-9)


def test_modularity_all_one_community_is_zero(spark):
    # Q of the all-in-one partition is exactly 0 by the identity
    # sum(e_c)=m, sum(D_c)=2m.
    pairs = [(1, 2), (2, 3), (1, 3), (3, 4)]
    edges = _edges_df(spark, pairs)
    assign = spark.createDataFrame(
        [(n, 1) for n in (1, 2, 3, 4)], "node long, community long"
    )
    row = G.modularity(edges, assign).collect()[0]
    assert row.modularity == 0.0


def _tarjan_sccs(edges):
    from collections import defaultdict

    g = defaultdict(list)
    nodes = set()
    for s, d in edges:
        g[s].append(d)
        nodes.add(s)
        nodes.add(d)
    index, low, onstk, stk, comps = {}, {}, set(), [], []
    ctr = [0]

    def strong(v):
        work = [(v, 0)]
        while work:
            node, pi = work.pop()
            if pi == 0:
                index[node] = low[node] = ctr[0]
                ctr[0] += 1
                stk.append(node)
                onstk.add(node)
            recurse = False
            for i in range(pi, len(g[node])):
                w = g[node][i]
                if w not in index:
                    work.append((node, i + 1))
                    work.append((w, 0))
                    recurse = True
                    break
                if w in onstk:
                    low[node] = min(low[node], index[w])
            if not recurse:
                if low[node] == index[node]:
                    comp = []
                    while True:
                        w = stk.pop()
                        onstk.discard(w)
                        comp.append(w)
                        if w == node:
                            break
                    comps.append(comp)
                if work:
                    low[work[-1][0]] = min(low[work[-1][0]], low[node])

    for v in sorted(nodes):
        if v not in index:
            strong(v)
    return {n: min(c) for c in comps for n in c}


def test_scc_matches_tarjan_on_chained_cycles(spark):
    # Two cycles joined by a one-way bridge (so they are SEPARATE
    # SCCs and the peel needs more than one outer round), a tail path,
    # and an isolated edge pair. Canonical min-member labels must
    # match a sequential Tarjan exactly.
    from datapoints_csv_extractor_spark.operators.graph import (
        scc_components,
    )

    edges = [
        # cycle A: 1 -> 2 -> 3 -> 1
        (1, 2), (2, 3), (3, 1),
        # bridge A -> B (one-way: different SCCs)
        (3, 4),
        # cycle B: 4 -> 5 -> 6 -> 4
        (4, 5), (5, 6), (6, 4),
        # tail: 6 -> 7 -> 8 (singletons)
        (6, 7), (7, 8),
        # separate 2-cycle: 10 <-> 11
        (10, 11), (11, 10),
        # one-way pair: 20 -> 21 (singletons)
        (20, 21),
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.scc_id for r in scc_components(df).collect()}
    assert got == _tarjan_sccs(edges)


def test_mst_boruvka_matches_kruskal_reference(spark):
    """The distributed Boruvka forest must equal a sequential
    Kruskal with the identical total edge order (cost, p1, p2) —
    edge-set equality, not just total weight, since the tie-broken
    MST is unique."""
    from datapoints_csv_extractor_spark.operators.graph import (
        co_order_weighted_edges,
        q_mst_boruvka,
    )

    sf = "/root/testdata/sf0.001"
    edges = [
        (r.p1, r.p2, r.n_shared)
        for r in co_order_weighted_edges(spark, sf).collect()
    ]

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    want = set()
    for p1, p2, w in sorted(edges, key=lambda e: (-e[2], e[0], e[1])):
        r1, r2 = find(p1), find(p2)
        if r1 != r2:
            parent[r1] = r2
            want.add((p1, p2, w))

    got = {
        (r.p1, r.p2, r.n_shared_orders)
        for r in q_mst_boruvka(spark, sf).collect()
    }
    assert got == want
    # Forest invariant: |edges| = |nodes| - |components|.
    nodes = {p for e in edges for p in e[:2]}
    comps = len({find(n) for n in nodes})
    assert len(got) == len(nodes) - comps
