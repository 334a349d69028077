"""Grid-blocked point-in-polygon spatial join.

The reference engine's domain is geospatial ETL (MGRS tiles, bbox
filters, GeoParquet output — SURVEY §2.A A14/A15/A21/A23); the one
spatial primitive it leaves to the warehouse downstream is the
polygon containment join. This operator supplies it Spark-first,
without a geometry library:

- **Blocking**: each polygon explodes to the grid cells its bounding
  box covers (bbox from ``array_min/array_max`` of the vertex
  arrays); each point hashes to exactly ONE cell — so a (polygon,
  point) pair can meet in at most one cell and the equi-join needs
  no post-dedup. Cost is Σ_cell |points_c|·|polys_c|, never
  |points|·|polys|; cell_size tunes the blocking the way an R-tree
  node size would.
- **Exact verify**: convex containment as a pure codegen'd HOF — the
  standard same-side cross-product test, ``min_i((v_{i+1}-v_i) ×
  (p-v_i)) >= 0`` over the CCW vertex ring (boundary counts inside).
  No UDF, no geometry objects; arithmetic is plain IEEE doubles so
  any engine replays it bit-for-bit.

Polygons must be CONVEX with vertices in counter-clockwise order —
the contract of the sign test (concave shapes need a triangulation
pass first, which composes: triangulate → this join → dedup pairs).

At 100 TB: both sides shuffle on the cell key (or the poly-cell side
broadcasts when small — AQE decides); skewed cells (a megacity cell)
are bounded by cell_size choice, and the verify is branch-free
per-pair math inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _inside_expr(vx: str, vy: str, px: str, py: str) -> str:
    """SQL boolean: point (px,py) inside the convex CCW ring
    (vx,vy). Array columns are 1-indexed; edge i runs v_i → v_{i%n+1}."""
    return (
        f"array_min(transform(sequence(1, size({vx})), i -> "
        f"(element_at({vx}, CAST(i % size({vx}) + 1 AS INT))"
        f" - element_at({vx}, CAST(i AS INT))) * ({py} - element_at({vy}, CAST(i AS INT)))"
        f" - (element_at({vy}, CAST(i % size({vx}) + 1 AS INT))"
        f" - element_at({vy}, CAST(i AS INT))) * ({px} - element_at({vx}, CAST(i AS INT)))"
        f")) >= 0D"
    )


def point_in_polygon_join(
    points: DataFrame,
    polygons: DataFrame,
    cell_size: float,
    x: str = "x",
    y: str = "y",
    vx: str = "vx",
    vy: str = "vy",
) -> DataFrame:
    """points ⋈ polygons on convex containment, grid-blocked.

    ``points`` carries coordinate columns (x, y); ``polygons`` carries
    vertex-ring array columns (vx, vy) in CCW order plus any id/attr
    columns. Returns the inner join of every point with every polygon
    containing it (boundary inclusive), with all columns from both
    inputs except the internal cell keys.
    """
    cs = float(cell_size)
    poly_cells = (
        polygons.withColumn(
            "_gx",
            F.explode(
                F.sequence(
                    F.floor(F.array_min(vx) / cs),
                    F.floor(F.array_max(vx) / cs),
                )
            ),
        )
        .withColumn(
            "_gy",
            F.explode(
                F.sequence(
                    F.floor(F.array_min(vy) / cs),
                    F.floor(F.array_max(vy) / cs),
                )
            ),
        )
    )
    pts = points.withColumn("_gx", F.floor(F.col(x) / cs)).withColumn(
        "_gy", F.floor(F.col(y) / cs)
    )
    return (
        pts.join(poly_cells, ["_gx", "_gy"])
        .filter(F.expr(_inside_expr(vx, vy, x, y)))
        .drop("_gx", "_gy")
    )
