"""functions/graph.py: degree stats and PageRank.

PageRank's gate is the same pattern as k-means/PCA: dense numpy power
iteration on the identical transition matrix (weighted, out-strength
normalized, dangling teleport) must match the distributed result to
float tolerance — iterative linear algebra has no SQL oracle. Plus the
analytic invariants: ranks sum to 1 after every variant, a symmetric
uniform cycle gives uniform ranks, dangling mass is conserved, and a
known hub outranks leaves.
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from kafka_connect_logminer2_spark.functions.graph import (
    degree_stats,
    pagerank,
    undirected,
)


def _edges(spark, triples):
    return spark.createDataFrame(triples, "src long, dst long, weight double")


def _numpy_pagerank(triples, n_iter=10, d=0.85):
    nodes = sorted({s for s, _, _ in triples} | {t for _, t, _ in triples})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    W = np.zeros((n, n))
    for s, t, w in triples:
        W[idx[s], idx[t]] += w
    out = W.sum(axis=1)
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        dangling = r[out == 0].sum()
        contrib = np.zeros(n)
        nz = out > 0
        contrib = (W[nz] / out[nz, None]).T @ r[nz]
        r = (1 - d) / n + d * (contrib + dangling / n)
    return {v: r[idx[v]] for v in nodes}


class TestDegreeStats:
    def test_known_graph(self, spark):
        e = _edges(spark, [(1, 2, 3.0), (1, 3, 1.0), (2, 3, 2.0)])
        rows = {r["node"]: r for r in degree_stats(e).collect()}
        assert rows[1]["out_degree"] == 2 and rows[1]["out_strength"] == 4.0
        assert rows[1]["in_degree"] == 0
        assert rows[3]["in_degree"] == 2 and rows[3]["in_strength"] == 3.0
        assert rows[2]["out_degree"] == 1 and rows[2]["in_degree"] == 1

    def test_undirected_folds_reverse_pairs(self, spark):
        e = _edges(spark, [(1, 2, 3.0), (2, 1, 2.0), (1, 3, 1.0)])
        u = {(r["src"], r["dst"]): r["weight"] for r in undirected(e).collect()}
        assert u[(1, 2)] == 5.0 and u[(2, 1)] == 5.0
        assert u[(1, 3)] == 1.0 and u[(3, 1)] == 1.0


class TestPageRank:
    def _check_against_numpy(self, spark, triples, n_iter=10):
        got = {
            r["node"]: r["rank"]
            for r in pagerank(_edges(spark, triples), n_iter=n_iter).collect()
        }
        want = _numpy_pagerank(triples, n_iter=n_iter)
        assert set(got) == set(want)
        for v in want:
            assert got[v] == pytest.approx(want[v], abs=1e-12), v
        assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
        return got

    def test_matches_numpy_weighted_digraph(self, spark):
        triples = [
            (1, 2, 1.0), (1, 3, 2.0), (2, 3, 1.0), (3, 1, 1.0),
            (4, 1, 5.0), (2, 4, 0.5),
        ]
        self._check_against_numpy(spark, triples)

    def test_matches_numpy_with_dangling_node(self, spark):
        # node 9 has in-edges only: its mass must teleport, not vanish
        triples = [(1, 9, 1.0), (2, 9, 2.0), (1, 2, 1.0), (2, 1, 1.0)]
        got = self._check_against_numpy(spark, triples)
        assert got[9] > 0

    def test_uniform_cycle_gives_uniform_ranks(self, spark):
        triples = [(i, (i + 1) % 5, 1.0) for i in range(5)]
        got = {
            r["node"]: r["rank"]
            for r in pagerank(_edges(spark, triples), n_iter=7).collect()
        }
        for v in got.values():
            assert v == pytest.approx(0.2, abs=1e-12)

    def test_hub_outranks_leaves(self, spark):
        star = [(i, 0, 1.0) for i in range(1, 6)] + [(0, i, 1.0) for i in range(1, 6)]
        got = {
            r["node"]: r["rank"]
            for r in pagerank(_edges(spark, star), n_iter=10).collect()
        }
        assert got[0] > max(got[i] for i in range(1, 6)) * 2

    def test_weights_shift_mass(self, spark):
        # 1 links to 2 (w=9) and 3 (w=1): 2 must end up above 3
        triples = [(1, 2, 9.0), (1, 3, 1.0), (2, 1, 1.0), (3, 1, 1.0)]
        got = self._check_against_numpy(spark, triples)
        assert got[2] > got[3]

    def test_multi_edges_fold_before_iteration(self, spark):
        dup = [(1, 2, 1.0), (1, 2, 2.0), (2, 1, 1.0)]
        folded = [(1, 2, 3.0), (2, 1, 1.0)]
        a = {
            r["node"]: r["rank"]
            for r in pagerank(_edges(spark, dup), n_iter=5).collect()
        }
        b = {
            r["node"]: r["rank"]
            for r in pagerank(_edges(spark, folded), n_iter=5).collect()
        }
        assert a == b


class TestTriangles:
    def _edges(self, spark, pairs):
        from pyspark.sql import Row

        return spark.createDataFrame(
            [Row(src=a, dst=b) for a, b in pairs], "src long, dst long"
        )

    def test_known_graph(self, spark):
        from kafka_connect_logminer2_spark.functions.graph import triangle_listing

        # K4 (4 triangles) plus a pendant and a disconnected edge
        k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
        tris = triangle_listing(self._edges(spark, k4 + [(4, 5), (8, 9)])).collect()
        got = sorted(tuple(sorted((r["a"], r["b"], r["c"]))) for r in tris)
        assert got == [(1, 2, 3), (1, 2, 4), (1, 3, 4), (2, 3, 4)]

    def test_each_triangle_listed_once_star_skew(self, spark):
        # hub vertex with high degree: orientation must not duplicate or
        # drop triangles, and each triangle appears exactly once
        from kafka_connect_logminer2_spark.functions.graph import triangle_listing

        hub = [(0, i) for i in range(1, 30)]           # star: no triangles
        ring = [(i, i + 1) for i in range(1, 29)]      # fan: closes 28 triangles
        tris = triangle_listing(self._edges(spark, hub + ring)).collect()
        got = sorted(tuple(sorted((r["a"], r["b"], r["c"]))) for r in tris)
        assert got == [(0, i, i + 1) for i in range(1, 29)]
        assert len(got) == len(set(got))

    def test_triangle_free(self, spark):
        from kafka_connect_logminer2_spark.functions.graph import triangle_listing

        bipartite = [(i, 100 + j) for i in range(5) for j in range(5)]
        assert triangle_listing(self._edges(spark, bipartite)).count() == 0
