"""Contour extraction — marching squares over the pixel band.

Reference: alg/contour.cpp:283-520 + alg/marching_squares/*.h (GDAL's
contour writer walks 2x2 pixel cells, classifies the 4 corners against
the level, and emits interpolated segments per the standard 16-case
table; ambiguous saddles 5/10 resolved to the two-segment split).

Spark-first shape: the 2x2 corner gather is a halo join (shifted
equi-joins), the case classification + endpoint interpolation is pure
column arithmetic, and each cell emits 0-2 segment rows via a
filtered union — no Python anywhere. Because the whole computation is
integer compares + one double division per crossing, the DuckDB oracle
reproduces it bit-for-bit from THE SAME generated CASE fragments
(build_case_sql is shared by the operator and the oracle).

Stitching segments into polylines/polygons is the cross-partition
equivalence problem already solved for polygonize (label union);
segments are the operator contract here, as in GDAL's segment-writer
layer.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# case -> list of segments, each segment = (edgeA, edgeB);
# corners: bit0=v00, bit1=v10, bit2=v11, bit3=v01 (inside == value > L).
# Saddle cases 5 and 10 are ambiguous; the reference disambiguates by
# the cell-center mean (alg/marching_squares/square.h FudgeCase /
# center-average rule): when (v00+v10+v11+v01)/4 > level the two inside
# corners CONNECT through the center, flipping the segment pairing.
# We encode that as case bit 4 (case + 16 when center > level); the
# center bit only changes the pairing for 5/10 — every other extended
# case maps to the same segments as its low-4-bit case.
_BASE_SEGMENTS: dict[int, list[tuple[str, str]]] = {
    1: [("left", "bottom")],
    2: [("bottom", "right")],
    3: [("left", "right")],
    4: [("right", "top")],
    5: [("left", "bottom"), ("right", "top")],   # center <= L: separate
    6: [("bottom", "top")],
    7: [("left", "top")],
    8: [("top", "left")],
    9: [("bottom", "top")],
    10: [("bottom", "right"), ("top", "left")],  # center <= L: separate
    11: [("right", "top")],
    12: [("right", "left")],
    13: [("bottom", "right")],
    14: [("left", "bottom")],
}
CASE_SEGMENTS: dict[int, list[tuple[str, str]]] = {
    **_BASE_SEGMENTS,
    **{c + 16: segs for c, segs in _BASE_SEGMENTS.items() if c not in (5, 10)},
    21: [("left", "top"), ("bottom", "right")],   # 5, center > L: connected
    26: [("left", "bottom"), ("right", "top")],   # 10, center > L: connected
}


def _edge_exprs(level: int) -> dict[str, tuple[str, str]]:
    """(x, y) expression strings per cell edge — valid in BOTH Spark
    SQL and DuckDB (bigint arithmetic + one double division)."""
    L = level
    return {
        "bottom": (f"cx + (CAST({L} AS DOUBLE) - v00) / (v10 - v00)", "cy + 0.0"),
        "right": (f"cx + 1.0", f"cy + (CAST({L} AS DOUBLE) - v10) / (v11 - v10)"),
        "top": (f"cx + (CAST({L} AS DOUBLE) - v01) / (v11 - v01)", "cy + 1.0"),
        "left": (f"cx + 0.0", f"cy + (CAST({L} AS DOUBLE) - v00) / (v01 - v00)"),
    }


def case_expr(level: int) -> str:
    L = level
    return (
        f"CAST(v00 > {L} AS INT) + 2 * CAST(v10 > {L} AS INT) "
        f"+ 4 * CAST(v11 > {L} AS INT) + 8 * CAST(v01 > {L} AS INT) "
        # center-average saddle bit (exact: 4*mean > 4*L in int math;
        # BIGINT casts — 4 band values of ~2^30 overflow int32)
        f"+ 16 * CAST(CAST(v00 AS BIGINT) + v10 + v11 + v01 "
        f"> 4 * CAST({L} AS BIGINT) AS INT)"
    )


def slot_exprs(level: int, slot: int) -> tuple[str, str, str, str, list[int]]:
    """CASE fragments (x1, y1, x2, y2) for segment slot 0 or 1, plus the
    case ids that populate the slot."""
    edges = _edge_exprs(level)
    cases = [c for c, segs in CASE_SEGMENTS.items() if len(segs) > slot]
    exprs = []
    for coord in range(4):  # x1, y1, x2, y2
        whens = []
        for c in cases:
            ea, eb = CASE_SEGMENTS[c][slot]
            pt = edges[ea] if coord < 2 else edges[eb]
            whens.append(f"WHEN {c} THEN ({pt[coord % 2]})")
        exprs.append(f"CASE ({case_expr(level)}) " + " ".join(whens) + " END")
    return (*exprs, cases)  # type: ignore[return-value]


def contour_segments(band: DataFrame, *, level: int, width: int,
                     height: int | None = None) -> DataFrame:
    """Marching-squares segments at `level`. band: (gx, gy, value)
    integer pixels; returns (cx, cy, x1, y1, x2, y2) per segment.
    height defaults to width (square rasters)."""
    height = height if height is not None else width
    cells = (
        band.select(F.col("gx").alias("cx"), F.col("gy").alias("cy"),
                    F.col("value").alias("v00"))
        .filter((F.col("cx") < width - 1) & (F.col("cy") < height - 1))
    )
    for (dx, dy, name) in ((1, 0, "v10"), (0, 1, "v01"), (1, 1, "v11")):
        cells = cells.join(
            band.select(
                (F.col("gx") - dx).alias("cx"), (F.col("gy") - dy).alias("cy"),
                F.col("value").alias(name),
            ),
            ["cx", "cy"],
        )
    outs = []
    for slot in (0, 1):
        x1, y1, x2, y2, cases = slot_exprs(level, slot)
        in_list = ", ".join(str(c) for c in cases)
        outs.append(
            cells.filter(F.expr(f"({case_expr(level)}) IN ({in_list})")).select(
                "cx", "cy",
                F.expr(x1).alias("x1"), F.expr(y1).alias("y1"),
                F.expr(x2).alias("x2"), F.expr(y2).alias("y2"),
            )
        )
    return outs[0].unionByName(outs[1])


def contour_multi(band: DataFrame, *, levels: list[int], width: int,
                  height: int | None = None) -> DataFrame:
    """Multi-level contour (the reference's interval/fixed level
    generators, alg/contour.cpp:283-520): union of per-level segment
    sets with a `level` column."""
    out = None
    for lv in levels:
        seg = contour_segments(band, level=lv, width=width, height=height) \
            .withColumn("level", F.lit(lv))
        out = seg if out is None else out.unionByName(seg)
    return out


def contour_oracle_sql(level: int, width: int, band_val_sql) -> str:
    """DuckDB twin built from the SAME case fragments. band_val_sql:
    fn(pid_expr) -> closed-form value SQL."""
    parts = []
    for slot in (0, 1):
        x1, y1, x2, y2, cases = slot_exprs(level, slot)
        in_list = ", ".join(str(c) for c in cases)
        parts.append(f"""
SELECT cx, cy, ({x1}) AS x1, ({y1}) AS y1, ({x2}) AS x2, ({y2}) AS y2
FROM cells WHERE ({case_expr(level)}) IN ({in_list})""")
    w = width
    return f"""
WITH px AS (SELECT r.range % {w} AS gx, r.range // {w} AS gy FROM range({w * w}) r),
cells AS (
  SELECT gx AS cx, gy AS cy,
         {band_val_sql(f"gy * {w} + gx")} AS v00,
         {band_val_sql(f"gy * {w} + gx + 1")} AS v10,
         {band_val_sql(f"(gy + 1) * {w} + gx")} AS v01,
         {band_val_sql(f"(gy + 1) * {w} + gx + 1")} AS v11
  FROM px WHERE gx < {w - 1} AND gy < {w - 1}
)
{" UNION ALL ".join(parts)}
"""
