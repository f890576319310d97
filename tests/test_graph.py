"""Unit coverage for the graph-analytics operators (pagerank is also
oracle-checked end-to-end via __spark_entry__): hand-computed small graphs,
a pure-Python reference implementation on a deterministic pseudo-random
graph, and the dangling-mass conservation property."""

import pytest

from yckg_spark.operators.graph import degrees, pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["src", "dst"])


def _pagerank_py(edge_list, n_iter, damping=0.85, redistribute=True):
    nodes = sorted({u for u, _ in edge_list} | {v for _, v in edge_list})
    n = len(nodes)
    odeg = {}
    for u, _ in edge_list:
        odeg[u] = odeg.get(u, 0) + 1
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(n_iter):
        dangling = sum(r for v, r in rank.items() if v not in odeg)
        base = (1.0 - damping) / n + (damping * dangling / n if redistribute else 0.0)
        new = {v: base for v in nodes}
        for u, v in edge_list:
            new[v] += damping * rank[u] / odeg[u]
        rank = new
    return rank


def test_pagerank_two_node_cycle_is_uniform(spark):
    """A -> B -> A: perfectly symmetric, so rank stays exactly 1/2."""
    out = {r["node"]: r["rank"]
           for r in pagerank(_edges(spark, [(1, 2), (2, 1)]), n_iter=4).collect()}
    assert out[1] == pytest.approx(0.5, abs=1e-12)
    assert out[2] == pytest.approx(0.5, abs=1e-12)


def test_pagerank_dangling_mass_conserved(spark):
    """B has no out-edges; with redistribution the total rank mass stays
    exactly 1, without it mass leaks every iteration."""
    e = _edges(spark, [(1, 2), (3, 2)])
    kept = sum(r["rank"] for r in pagerank(e, n_iter=5).collect())
    leaked = sum(
        r["rank"]
        for r in pagerank(e, n_iter=5, redistribute_dangling=False).collect()
    )
    assert kept == pytest.approx(1.0, abs=1e-9)
    assert leaked < 0.9


def test_pagerank_matches_python_reference(spark):
    """Deterministic pseudo-random graph, both dangling modes, value-level
    agreement with an independent driver-side implementation."""
    edge_list = sorted({(i % 23, (i * i + 7) % 23) for i in range(60)})
    e = _edges(spark, edge_list)
    for mode in (True, False):
        want = _pagerank_py(edge_list, n_iter=6, redistribute=mode)
        got = {r["node"]: r["rank"]
               for r in pagerank(e, n_iter=6, redistribute_dangling=mode).collect()}
        assert set(got) == set(want)
        for v in want:
            assert got[v] == pytest.approx(want[v], abs=1e-12), (mode, v)


def test_pagerank_reliable_checkpoint_matches_local(spark, tmp_path):
    edge_list = [(1, 2), (2, 3), (3, 1), (4, 1)]
    a = sorted(map(tuple, pagerank(_edges(spark, edge_list), n_iter=4).collect()))
    b = sorted(
        map(
            tuple,
            pagerank(
                _edges(spark, edge_list), n_iter=4,
                checkpoint_dir=str(tmp_path / "ckpt"),
            ).collect(),
        )
    )
    assert a == b


def test_degrees_full_outer(spark):
    """Pure sources and pure sinks both appear with a zero side."""
    out = {r["node"]: (r["out_deg"], r["in_deg"])
           for r in degrees(_edges(spark, [(1, 2), (1, 3), (2, 3)])).collect()}
    assert out == {1: (2, 0), 2: (1, 1), 3: (0, 2)}


def test_triangle_count_known_graph(spark):
    """K4 minus one edge has exactly two triangles sharing an edge; the
    counts are per-node memberships. Direction, duplicates, and
    self-loops must not inflate anything."""
    from yckg_spark.operators.graph import triangle_count

    edges = [
        # K4 on {1,2,3,4} minus the (1,4) edge -> triangles 123 and 234
        (1, 2), (2, 3), (3, 1), (2, 4), (3, 4),
        # noise: reversed duplicate, exact duplicate, self-loop, pendant
        (3, 2), (1, 2), (5, 5), (4, 6),
    ]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["n_triangles"] for r in triangle_count(df).collect()}
    assert got == {1: 1, 2: 2, 3: 2, 4: 1}


def test_triangle_count_no_triangles(spark):
    from yckg_spark.operators.graph import triangle_count

    df = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], ["src", "dst"])
    assert triangle_count(df).count() == 0
