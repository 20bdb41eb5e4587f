"""Graph analytics over edge DataFrames: deterministic PageRank and
triangle counting.

The reference ships its graph OUT to Neo4j/TuGraph
(``app/service/log_neo4j_importer.ts``, ``app/service/tugraph.ts``) and
lets those engines do the analysis; this module is the in-engine analog
(SURVEY §2 additive track) so a graph built by :mod:`.graph` — or any
(src, dst) edge frame — can be analyzed without leaving Spark.

Design constraints, both scale-driven:

- **PageRank is fixed-point integer arithmetic.** Float PageRank sums
  contributions in shuffle order, so two runs (or two engines) disagree
  in the last ulps — unacceptable for the repo's bit-identical
  cross-engine verification. Ranks are scaled longs (1.0 == 10^9);
  per-edge contribution is ``r div outdeg``; the damping update is
  ``(15*scale + 85*sum) div 100``. Every op is exact integer math, so
  iteration order, partitioning, and engine cannot change a single bit.
  Mass bound: 85 * N * scale must stay under 2^63 — fine to ~10^8 nodes
  at the default scale.
- **Triangles are counted on degree-ordered oriented edges.** Counting
  on raw undirected edges squares the max degree in the wedge join; the
  classic fix orients each edge from the (degree, id)-smaller endpoint
  to the larger, which caps oriented out-degree at O(sqrt(|E|)) and
  makes the wedge join's skew bounded. Each triangle survives as exactly
  one wedge + closing edge, so no /3 correction or dedup pass is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cache import CacheScope, persist_in

PR_SCALE = 10**9


def undirected(pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b") -> DataFrame:
    """Both directions of an a<b pair list as (src, dst)."""
    fwd = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    rev = pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
    return fwd.unionAll(rev)


def pagerank_fixed_point(
    edges: DataFrame,
    iters: int = 3,
    scale: int = PR_SCALE,
    scope: CacheScope | None = None,
) -> DataFrame:
    """Deterministic PageRank over directed (src, dst) edges.

    Returns (id, r) with r the scaled-integer rank after ``iters``
    damped iterations from a uniform start of ``scale`` per node. Only
    nodes with out-degree participate (feed an undirected edge list for
    the usual symmetric case — every node then has both degrees).

    Each iteration is one join + one aggregation (shuffle on dst);
    ``localCheckpoint`` truncates the lineage per round exactly like
    :func:`.dedup_text.connected_components`, keeping the plan O(1) in
    the iteration count.
    """
    # every iteration re-reads the edge list and degrees; materializing
    # them turns the loop body into a cached-join + agg instead of
    # re-running the upstream projection `iters` times (cache.py
    # lifetime notes). r13: lazy localCheckpoint over persist — every
    # iteration's eager analysis and the per-action optimizer walk a
    # LEAF edge relation instead of the distinct+union subtree (A/B
    # pagerank_user_item 3/3 pairwise, min 2.43 -> 1.27 s; the
    # triangle helpers stay persisted — their A/B lost)
    from .cache import checkpoint_in

    edges = checkpoint_in(scope, edges)
    deg = checkpoint_in(
        scope, edges.groupBy("src").agg(F.count("*").alias("od"))
    )
    ranks = deg.select(F.col("src").alias("id"), F.lit(scale).cast("long").alias("r"))
    for _ in range(iters):
        contribs = (
            edges.join(deg, "src")
            .join(ranks.withColumnRenamed("id", "src"), "src")
            .select(F.col("dst").alias("id"), F.expr("r div od").alias("c"))
        )
        ranks = (
            contribs.groupBy("id")
            .agg(F.sum("c").alias("s"))
            .select("id", F.expr(f"({15 * scale} + 85 * s) div 100").alias("r"))
            .localCheckpoint(eager=False)
        )
    return ranks


def _closed_triangles(
    pairs: DataFrame,
    id_a: str,
    id_b: str,
    scope: CacheScope | None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Shared triangle machinery: (pairs persisted, per-node degrees,
    closed triangles as (a, b, c) in orientation order).

    Orientation by (degree, id) bounds the wedge fan-out at O(sqrt(E));
    edges are distinct, so the closing inner join has multiplicity 1 and
    each triangle surfaces exactly once — no dedup, no /3. The pair list
    and the oriented edges each feed multiple consumers, so both are
    persisted (without this the upstream projection runs ~5x)."""
    pairs = persist_in(scope, pairs)
    und = undirected(pairs, id_a, id_b)
    deg = und.groupBy("src").agg(F.count("*").alias("d")).withColumnRenamed("src", "n")
    e = (
        pairs.join(deg.select(F.col("n").alias(id_a), F.col("d").alias("da")), id_a)
        .join(deg.select(F.col("n").alias(id_b), F.col("d").alias("db")), id_b)
        .select(
            F.when(
                (F.col("da") < F.col("db"))
                | ((F.col("da") == F.col("db")) & (F.col(id_a) < F.col(id_b))),
                F.struct(F.col(id_a).alias("src"), F.col(id_b).alias("dst")),
            )
            .otherwise(F.struct(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
            .alias("o")
        )
        .select("o.src", "o.dst")
    )
    e = persist_in(scope, e)
    wedges = (
        e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .join(e.select(F.col("src").alias("b"), F.col("dst").alias("c")), "b")
        .select("a", "b", "c")
    )
    tri = wedges.join(
        e.select(F.col("src").alias("a"), F.col("dst").alias("c")), ["a", "c"]
    )
    return pairs, deg, tri


def triangle_summary(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    scope: CacheScope | None = None,
) -> DataFrame:
    """One row: (n_nodes, n_edges, n_triangles) for an a<b pair list
    (see :func:`_closed_triangles` for the shape argument)."""
    pairs, deg, tri = _closed_triangles(pairs, id_a, id_b, scope)
    return (
        deg.agg(F.count("*").alias("n_nodes"))
        .crossJoin(pairs.agg(F.count("*").alias("n_edges")))
        .crossJoin(tri.agg(F.count("*").alias("n_triangles")))
    )


def local_clustering(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    scope: CacheScope | None = None,
) -> DataFrame:
    """Local clustering coefficient per node: 2T / (d * (d-1)) for every
    node with degree >= 2 (degree-1 nodes have no possible wedge).

    Each closed triangle is exploded to its three vertices and counted
    per node — triangle volume, not corpus volume, so the explode is
    cheap even on graphs where enumeration dwarfs the summary count.
    The coefficient is an exact int/int division (deterministic), only
    rounded for display.
    """
    _, deg, tri = _closed_triangles(pairs, id_a, id_b, scope)
    per_node = (
        tri.select(
            F.explode(F.array(F.col("a"), F.col("b"), F.col("c"))).alias("n")
        )
        .groupBy("n")
        .agg(F.count("*").alias("n_triangles"))
    )
    d = F.col("d").cast("double")
    return (
        deg.filter(F.col("d") >= 2)
        .join(per_node, "n", "left")
        .select(
            F.col("n").alias("id"),
            F.col("d").alias("degree"),
            F.coalesce("n_triangles", F.lit(0).cast("long")).alias("n_triangles"),
            F.round(
                2.0 * F.coalesce("n_triangles", F.lit(0)) / (d * (d - 1)), 6
            ).alias("clustering_coeff"),
        )
    )


def degree_distribution(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """(degree, n_nodes) histogram of an a<b pair list — two map-side
    combined aggregations, the cheapest useful shape signal of a graph."""
    return (
        undirected(pairs, id_a, id_b)
        .groupBy("src")
        .agg(F.count("*").alias("degree"))
        .groupBy("degree")
        .agg(F.count("*").alias("n_nodes"))
    )
