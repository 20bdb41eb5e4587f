from __future__ import annotations

from clickhouse_github_log_importer_spark.operators.clustering import (
    _trunc_div,
    kmeans_fit,
    kmeans_keepers,
    kmeans_profile,
)


def emb(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


def test_trunc_div_matches_duckdb():
    import duckdb

    for s, n in [(-1000, 3), (1000, 3), (-7, 2), (7, 2), (0, 5), (-5, 5)]:
        assert _trunc_div(s, n) == duckdb.sql(f"SELECT {s} // {n}").fetchone()[0]


def test_kmeans_hand_computed(spark):
    # init c0=(1000,0), c1=(900,0); after one update c1 = trunc(-1000/3)
    df = emb(spark, [(0, (1.0, 0)), (1, (0.9, 0)), (2, (-1.0, 0)), (3, (-0.9, 0))])
    assigned, cents = kmeans_fit(df, k=2, iters=1)
    assert cents == [[1000, 0], [-333, 0]]
    by = {r["vec_id"]: r for r in assigned.collect()}
    assert [by[i]["cluster_id"] for i in range(4)] == [0, 0, 1, 1]
    assert by[0]["d2"] == 0
    assert by[3]["d2"] == (-900 + 333) ** 2

    keep = {r["cluster_id"]: r for r in kmeans_keepers(assigned).collect()}
    assert keep[0]["keeper_vec_id"] == 0 and keep[0]["d2"] == 0
    assert keep[1]["keeper_vec_id"] == 3  # 567^2 < 667^2

    prof = {r["cluster_id"]: r for r in kmeans_profile(assigned, cents).collect()}
    assert prof[0]["n_members"] == 2 and prof[0]["min_vec_id"] == 0
    assert prof[1]["centroid_norm2"] == 333 * 333


def test_kmeans_empty_cluster_keeps_previous_and_ties_break_low(spark):
    # identical vectors: init centroids identical -> every vector ties and
    # goes to cluster 0; cluster 1 is empty and must keep its previous
    # centroid, never NaN/zero out
    df = emb(spark, [(i, (0.5, 0.5)) for i in range(4)])
    assigned, cents = kmeans_fit(df, k=2, iters=2)
    assert cents == [[500, 500], [500, 500]]
    assert {r["cluster_id"] for r in assigned.collect()} == {0}


def test_kmeans_filters_zero_norm(spark):
    df = emb(spark, [(0, (0.0, 0.0)), (1, (1.0, 0)), (2, (0.9, 0)), (3, (-1.0, 0))])
    assigned, _ = kmeans_fit(df, k=2, iters=1)
    ids = {r["vec_id"] for r in assigned.collect()}
    assert 0 not in ids and ids == {1, 2, 3}
