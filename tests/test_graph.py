"""Unit tests for the integer-arithmetic PageRank operator
(prox_spark/graph.py): exact agreement with a pure-Python model of the
same integer recurrence, and the structural properties the curation
use-case relies on."""

from __future__ import annotations

from prox_spark.graph import MASS, pagerank


def _py_pagerank(edges: list[tuple[int, int]], iters: int) -> dict[int, int]:
    """Reference model: identical integer recurrence, plain dicts."""
    out: dict[int, int] = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    nodes = sorted(out)
    n = len(nodes)
    init = MASS // n
    base = (15 * init) // 100
    rank = {v: init for v in nodes}
    for _ in range(iters):
        inflow: dict[int, int] = {}
        for s, d in edges:
            inflow[d] = inflow.get(d, 0) + rank[s] // out[s]
        rank = {v: base + (85 * inflow.get(v, 0)) // 100 for v in nodes}
    return rank


def _sym(pairs: list[tuple[int, int]]) -> list[tuple[int, int]]:
    return pairs + [(b, a) for a, b in pairs]


def test_pagerank_matches_integer_model_exactly(spark):
    # deterministic irregular graph: star + chain + a cycle tail
    pairs = [(0, 1), (0, 2), (0, 3), (3, 4), (4, 5), (5, 3), (2, 6)]
    edges = _sym(pairs)
    df = spark.createDataFrame(edges, "src BIGINT, dst BIGINT")
    got = {r.node: r.rank for r in pagerank(df, iters=5).collect()}
    assert got == _py_pagerank(edges, 5)


def test_pagerank_hub_outranks_leaves(spark):
    pairs = [(0, i) for i in range(1, 8)]
    df = spark.createDataFrame(_sym(pairs), "src BIGINT, dst BIGINT")
    ranks = {r.node: r.rank for r in pagerank(df, iters=5).collect()}
    hub = ranks.pop(0)
    assert all(hub > v for v in ranks.values())
    # leaves are symmetric: identical integer ranks, bit-for-bit
    assert len(set(ranks.values())) == 1
    # truncating division only ever LEAKS mass, never creates it
    assert hub + sum(ranks.values()) <= MASS


def test_pagerank_symmetric_path_is_bit_identical(spark):
    """The r12 optimization: symmetric=True skips the per-round
    re-anchor join. On a symmetrized edge list (every node has an
    in-edge) the ranks must be bit-identical to the general path and
    to the pure-Python model — weighted and unweighted."""
    pairs = [(0, 1), (0, 2), (0, 3), (3, 4), (4, 5), (5, 3), (2, 6)]
    edges = _sym(pairs)
    df = spark.createDataFrame(edges, "src BIGINT, dst BIGINT")
    fast = {r.node: r.rank for r in pagerank(df, iters=5, symmetric=True).collect()}
    assert fast == _py_pagerank(edges, 5)

    wpairs = [(0, 1, 5), (0, 2, 1), (2, 3, 7), (3, 0, 2)]
    wedges = wpairs + [(b, a, w) for a, b, w in wpairs]
    wdf = spark.createDataFrame(wedges, "src BIGINT, dst BIGINT, w BIGINT")
    slow = {
        r.node: r.rank for r in pagerank(wdf, iters=5, weight_col="w").collect()
    }
    wfast = {
        r.node: r.rank
        for r in pagerank(wdf, iters=5, weight_col="w", symmetric=True).collect()
    }
    assert wfast == slow


def test_weighted_pagerank_matches_integer_model(spark):
    from prox_spark.graph import pagerank

    pairs = [(0, 1, 5), (0, 2, 1), (2, 3, 7), (3, 0, 2)]
    edges = pairs + [(b, a, w) for a, b, w in pairs]
    df = spark.createDataFrame(edges, "src BIGINT, dst BIGINT, w BIGINT")
    got = {r.node: r.rank for r in pagerank(df, iters=5, weight_col="w").collect()}

    outw: dict[int, int] = {}
    for s, _, w in edges:
        outw[s] = outw.get(s, 0) + w
    nodes = sorted(outw)
    init = MASS // len(nodes)
    base = (15 * init) // 100
    rank = {v: init for v in nodes}
    for _ in range(5):
        inflow: dict[int, int] = {}
        for s, d, w in edges:
            inflow[d] = inflow.get(d, 0) + (rank[s] * w) // outw[s]
        rank = {v: base + (85 * inflow.get(v, 0)) // 100 for v in nodes}
    assert got == rank


def test_pagerank_restores_aqe_conf(spark):
    """r13: pagerank disables AQE for its fixpoint (stable tiny plans;
    AQE's per-stage materialization jobs dominated the loop) and must
    restore the session conf on BOTH the normal and the error path —
    a leaked 'false' would change every later query's planning."""
    key = "spark.sql.adaptive.enabled"
    assert spark.conf.get(key) == "true"
    df = spark.createDataFrame(_sym([(0, 1), (1, 2)]), "src BIGINT, dst BIGINT")
    pagerank(df, iters=2, symmetric=True).collect()
    assert spark.conf.get(key) == "true"
    bad = spark.createDataFrame([(1, 2)], "src BIGINT, wrong BIGINT")
    try:
        pagerank(bad, iters=1)
    except Exception:
        pass
    assert spark.conf.get(key) == "true"


def test_triangle_count_known_graphs(spark):
    from prox_spark.graph import triangle_count

    def tc(pairs):
        df = spark.createDataFrame(pairs, "src BIGINT, dst BIGINT")
        return triangle_count(df)

    # K5: C(5,2) = 10 edges, C(5,3) = 10 triangles; with all degrees
    # tied the orientation falls back to id order, so oriented
    # out-degrees are 4,3,2,1,0 -> sum C(d,2) = 6+3+1 = 10 wedges
    k5 = [(i, j) for i in range(5) for j in range(5) if i < j]
    assert tc(k5) == (5, 10, 10, 10)

    # path graph: zero triangles
    assert tc([(0, 1), (1, 2), (2, 3)])[3] == 0

    # bipartite K2,3: zero triangles (odd cycles impossible)
    assert tc([(i, 10 + j) for i in range(2) for j in range(3)])[3] == 0

    # normalization: self-loops, duplicates, reversed duplicates
    messy = [(0, 1), (1, 0), (0, 1), (1, 2), (0, 2), (2, 2)]
    assert tc(messy) == (3, 3, 1, 1)

    # two triangles sharing an edge
    assert tc([(0, 1), (1, 2), (0, 2), (2, 3), (1, 3)])[3] == 2


def test_triangle_count_matches_brute_force_on_seeded_graphs(spark):
    """Randomized (md5-seeded, reproducible) graphs vs an O(n^3)
    reference count — exercises orientation ties, isolated-ish nodes,
    and skewed degrees beyond the hand-picked cases."""
    import hashlib
    from itertools import combinations

    from prox_spark.graph import triangle_count

    for seed in range(5):
        n = 12 + seed * 3
        pairs = []
        for i, j in combinations(range(n), 2):
            h = int(hashlib.md5(f"{seed}:{i}:{j}".encode()).hexdigest()[:8], 16)
            if h % 100 < 30:  # ~30% edge density
                pairs.append((i, j))
        adj = {p for p in pairs} | {(b, a) for a, b in pairs}
        expected = sum(
            1
            for a, b, c in combinations(range(n), 3)
            if (a, b) in adj and (b, c) in adj and (a, c) in adj
        )
        df = spark.createDataFrame(pairs, "src BIGINT, dst BIGINT")
        n_nodes, n_edges, n_wedges, n_tri = triangle_count(df)
        assert n_tri == expected, (seed, n_tri, expected)
        assert n_edges == len(pairs)
        assert n_wedges >= n_tri
