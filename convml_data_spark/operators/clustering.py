"""Density-based clustering (DBSCAN) as relational algebra — the §2.12 X4
embedding-transform family's density member.

Reference: ``embeddings/transforms.py:17-139`` dispatches ``hdbscan`` for
density clustering of embedding spaces. hdbscan the library is not in this
container (and its single-node mutual-reachability MST does not decompose
into bounded relational rounds anyway); DBSCAN is the classic density
clusterer with an EXACT distributed formulation, so it stands in as the
density transform — same fit/apply surface, same label-column shape
(cluster ids + noise), deterministic.

Algorithm (all hash joins on bounded keys — no cartesian product, no
driver-side state):

1. **Epsilon grid**: cell = (⌊x/eps⌋, ⌊y/eps⌋). Any two points within
   ``eps`` lie in the same or an adjacent cell, so candidate pairs come
   from ONE equi-join on the target cell after a 3×3 neighbor-offset
   explode (constant fan-out 9) — shuffle ∝ 9·n, never n².
2. **Core points**: neighbor count within eps (self included) ≥ min_pts —
   one groupBy over the candidate pairs.
3. **Clusters**: connected components over core–core eps-edges via the
   alternating large-star/small-star contraction already used for dedup
   (:func:`~.dedup.connected_components`, O(log² n) rounds); a cluster's
   label is its minimum core id.
4. **Border points**: non-core within eps of ≥1 core join the component of
   their MINIMUM core neighbor (standard DBSCAN leaves border assignment
   scan-order-dependent; pinning argmin-by-id makes it deterministic and
   engine-replayable).
5. **Noise**: everything else; NULL label.

Scale: dense areas concentrate in few cells — per-cell point counts bound
the join fan-out; a pathological all-points-one-cell input degrades to the
per-cell pair square, which is the correct DBSCAN answer for that data
(every pair IS a neighbor pair) and still shuffles on the cell key, not a
cartesian. 100 TB: grid join + groupBy + CC rounds, all hash-partitioned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dbscan_labels(
    points: DataFrame,
    eps: float,
    min_pts: int,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    durable: bool | None = None,
) -> DataFrame:
    """Exact 2-D DBSCAN: returns ``(id, label, is_core)`` with
    ``label`` = the minimum core id of the point's cluster (NULL = noise).

    ``points`` must be unique per ``id_col``. Inputs with more dimensions
    should pass a 2-D projection (the reference applies its density
    transform after PCA reduction for the same reason).

    ``durable`` picks the edge-list materialization
    (:func:`~.persist.materialize_for_reuse`): default executor-local
    checkpoint, or a reliable checkpoint that survives executor loss on a
    real cluster.
    """
    from .dedup import connected_components

    eps = float(eps)
    pts = points.select(
        F.col(id_col).alias("id"),
        F.col(x_col).cast("double").alias("x"),
        F.col(y_col).cast("double").alias("y"),
    )
    cx = F.floor(F.col("x") / F.lit(eps))
    cy = F.floor(F.col("y") / F.lit(eps))
    cells = pts.select("id", "x", "y", cx.alias("cx"), cy.alias("cy"))
    # left side explodes its 9 neighbor offsets -> equi-join on the target
    # cell; each unordered eps-pair appears in BOTH directions (a's offset
    # hits b's cell and vice versa), which is exactly what the per-point
    # neighbor count wants
    off = F.explode(
        F.array(
            *[
                F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                for dx in (-1, 0, 1)
                for dy in (-1, 0, 1)
            ]
        )
    ).alias("o")
    left = cells.select("id", "x", "y", "cx", "cy", off).select(
        F.col("id").alias("id_a"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        (F.col("cx") + F.col("o.dx")).alias("tcx"),
        (F.col("cy") + F.col("o.dy")).alias("tcy"),
    )
    right = cells.select(
        F.col("id").alias("id_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        F.col("cx").alias("tcx"),
        F.col("cy").alias("tcy"),
    )
    d2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    edges = (
        left.join(right, ["tcx", "tcy"])
        .where((F.col("id_a") != F.col("id_b")) & (d2 <= F.lit(eps * eps)))
        .select("id_a", "id_b")
    )
    # the edge list feeds three consumers (core counts, CC, border
    # assignment) — materialize it ONCE, lazily (an eager checkpoint
    # would execute the full grid join at plan CONSTRUCTION time — every
    # explain() of a dbscan query would run the job); durable=True swaps
    # the executor-local blocks for a reliable checkpoint
    from .persist import materialize_for_reuse

    edges = materialize_for_reuse(edges, durable=durable)
    n_nbr = edges.groupBy("id_a").agg(F.count("*").alias("_n"))
    core = (
        pts.join(n_nbr, pts.id == n_nbr.id_a, "left")
        .where(F.coalesce(F.col("_n"), F.lit(0)) + 1 >= F.lit(int(min_pts)))
        .select("id")
    )
    # clusters: components over core-core edges + core self-pairs (a core
    # with no core neighbor is its own single-point cluster)
    cc_edges = (
        edges.join(core.withColumnRenamed("id", "id_a"), "id_a")
        .join(core.withColumnRenamed("id", "id_b"), "id_b")
        .select("id_a", "id_b")
        .unionByName(core.select(F.col("id").alias("id_a"), F.col("id").alias("id_b")))
    )
    comp = connected_components(cc_edges, durable=durable).withColumnRenamed(
        "component", "label"
    )
    core_labeled = core.join(comp, "id").select("id", "label")
    # border: non-core with >= 1 core neighbor -> its minimum core
    # neighbor's cluster
    core_nbr = (
        edges.join(
            core_labeled.select(F.col("id").alias("id_b"), F.col("label")), "id_b"
        )
        .groupBy("id_a")
        .agg(F.min_by("label", F.col("id_b")).alias("label"))
    )
    border = (
        pts.select("id")
        .join(core_labeled.select("id"), "id", "left_anti")
        .join(core_nbr.withColumnRenamed("id_a", "id"), "id")
        .select("id", "label")
    )
    labeled = core_labeled.select(
        "id", "label", F.lit(True).alias("is_core")
    ).unionByName(border.select("id", "label", F.lit(False).alias("is_core")))
    return (
        pts.select("id")
        .join(labeled, "id", "left")
        .select("id", "label", F.coalesce("is_core", F.lit(False)).alias("is_core"))
    )
