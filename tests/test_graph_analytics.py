from __future__ import annotations

import pytest

from clickhouse_github_log_importer_spark.operators.graph_analytics import (
    PR_SCALE,
    degree_distribution,
    pagerank_fixed_point,
    triangle_summary,
    undirected,
)


def pairs(spark, edges):
    return spark.createDataFrame(edges, "id_a long, id_b long")


def test_pagerank_symmetric_two_node(spark):
    # a <-> b: perfect symmetry, ranks must be exactly equal and exactly
    # the fixed point (r = (15*scale + 85*r) / 100 stays at scale)
    ranks = {
        r["id"]: r["r"]
        for r in pagerank_fixed_point(undirected(pairs(spark, [(1, 2)]))).collect()
    }
    assert ranks[1] == ranks[2] == PR_SCALE


def test_pagerank_star_center_dominates(spark):
    ranks = {
        r["id"]: r["r"]
        for r in pagerank_fixed_point(
            undirected(pairs(spark, [(0, 1), (0, 2), (0, 3), (0, 4)]))
        ).collect()
    }
    assert ranks[0] > ranks[1]
    assert ranks[1] == ranks[2] == ranks[3] == ranks[4]  # leaves identical
    # integer mass can only leak downward via div-floor, never appear
    assert sum(ranks.values()) <= 5 * PR_SCALE


def test_pagerank_deterministic_across_runs(spark):
    e = undirected(pairs(spark, [(1, 2), (2, 3), (1, 3), (3, 4)]))
    a = sorted(map(tuple, pagerank_fixed_point(e, iters=4).collect()))
    b = sorted(map(tuple, pagerank_fixed_point(e, iters=4).collect()))
    assert a == b


@pytest.mark.parametrize(
    "edges,expected",
    [
        ([(1, 2), (2, 3), (1, 3)], 1),  # one triangle
        ([(1, 2), (2, 3), (3, 4), (1, 4)], 0),  # square, no chord
        ([(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)], 4),  # K4
        ([(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (3, 5)], 2),  # two joined
    ],
)
def test_triangle_summary(spark, edges, expected):
    row = triangle_summary(pairs(spark, edges)).collect()[0]
    assert row["n_triangles"] == expected
    assert row["n_edges"] == len(edges)
    assert row["n_nodes"] == len({v for e in edges for v in e})


def test_degree_distribution(spark):
    # star: center degree 3 once, leaves degree 1 three times
    rows = {
        r["degree"]: r["n_nodes"]
        for r in degree_distribution(pairs(spark, [(0, 1), (0, 2), (0, 3)])).collect()
    }
    assert rows == {3: 1, 1: 3}


def test_local_clustering(spark):
    from clickhouse_github_log_importer_spark.operators.graph_analytics import (
        local_clustering,
    )

    # K3 plus a pendant at node 3: 1,2 fully clustered; 3 has d=3 with
    # one closed pair of three; 4 has degree 1 -> excluded
    rows = {
        r["id"]: r
        for r in local_clustering(
            pairs(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
        ).collect()
    }
    assert set(rows) == {1, 2, 3}
    assert rows[1]["clustering_coeff"] == 1.0
    assert rows[2]["clustering_coeff"] == 1.0
    assert rows[3]["n_triangles"] == 1 and rows[3]["degree"] == 3
    assert rows[3]["clustering_coeff"] == round(2.0 * 1 / (3 * 2), 6)


def test_local_clustering_triangle_free(spark):
    from clickhouse_github_log_importer_spark.operators.graph_analytics import (
        local_clustering,
    )

    rows = local_clustering(pairs(spark, [(1, 2), (2, 3), (3, 4), (1, 4)])).collect()
    assert all(r["n_triangles"] == 0 and r["clustering_coeff"] == 0.0 for r in rows)
    assert len(rows) == 4
