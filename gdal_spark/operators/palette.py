"""Color-table family: rgb2pct / pct2rgb re-derived Spark-first.

Reference surface: GDALComputeMedianCutPCT
(alg/gdalmediancut.cpp:130,266 — default nBits=5, palette entry
((min+max)<<shift)/2, largest-box strict-max selection in head-first
list order, median split at cumsum >= total/2 with the i==first bump,
both halves shrunk to occupied bounds) and the nearest-entry
assignment of the dither path (alg/gdaldither.cpp:397 — squared-RGB
distance, first strictly-smaller entry wins, i.e. lowest index on
ties). r3 adds the full GDALDitherRGB2PCT error-diffusion recurrence
(`dither_rgb2pct` below): serial within an image, one applyInPandas
group per image — images parallelize, scanlines don't (the
reference streams scanlines for the same reason).

Scale shape: the color histogram is bounded by the color cube
(2^(3*nbits) cells — 32768 at the default 5 bits), NOT by the pixel
count, so it aggregates distributedly (groupBy + count) and collects
O(cube) rows to the driver where the 256-entry split loop is O(cube)
Python — the same in-memory structure the reference builds. The
palette then broadcasts back as literal arrays; assignment is pure
JVM integer column math (no UDF).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def median_cut_palette(df: DataFrame, n_colors: int = 256, *, nbits: int = 5,
                       r_col: str = "r", g_col: str = "g",
                       b_col: str = "b") -> list[tuple[int, int, int]]:
    """Compute the median-cut color table of an RGB pixel table.
    Returns [(r, g, b)] in the reference's palette order (final box
    list head-first)."""
    shift = 8 - nbits
    hist_rows = (
        df.groupBy(
            (F.col(r_col).cast("int") / (1 << shift)).cast("int").alias("r5"),
            (F.col(g_col).cast("int") / (1 << shift)).cast("int").alias("g5"),
            (F.col(b_col).cast("int") / (1 << shift)).cast("int").alias("b5"),
        )
        .count()
        .collect()
    )
    hist = {(row["r5"], row["g5"], row["b5"]): row["count"] for row in hist_rows}
    total = sum(hist.values())

    box0 = {
        "rmin": min(k[0] for k in hist), "rmax": max(k[0] for k in hist),
        "gmin": min(k[1] for k in hist), "gmax": max(k[1] for k in hist),
        "bmin": min(k[2] for k in hist), "bmax": max(k[2] for k in hist),
        "total": total,
    }
    used = [box0]  # index 0 == list head (reference prepends new boxes)
    n_free = n_colors - 1

    def cells_in(b):
        return [(k, c) for k, c in hist.items()
                if b["rmin"] <= k[0] <= b["rmax"]
                and b["gmin"] <= k[1] <= b["gmax"]
                and b["bmin"] <= k[2] <= b["bmax"]]

    def shrink(b):
        cells = cells_in(b)
        b["rmin"] = min(k[0] for k, _ in cells)
        b["rmax"] = max(k[0] for k, _ in cells)
        b["gmin"] = min(k[1] for k, _ in cells)
        b["gmax"] = max(k[1] for k, _ in cells)
        b["bmin"] = min(k[2] for k, _ in cells)
        b["bmax"] = max(k[2] for k, _ in cells)

    while n_free > 0:
        # largest_box: strict-max total among splittable, head-first
        ptr = None
        for b in used:
            if (b["rmax"] > b["rmin"] or b["gmax"] > b["gmin"]
                    or b["bmax"] > b["bmin"]) \
                    and (ptr is None or b["total"] > ptr["total"]):
                ptr = b
        if ptr is None:
            break
        # axis = largest extent; ties resolve R >= G >= B
        er = ptr["rmax"] - ptr["rmin"]
        eg = ptr["gmax"] - ptr["gmin"]
        eb = ptr["bmax"] - ptr["bmin"]
        if er >= eg and er >= eb:
            axis, amin, amax = 0, ptr["rmin"], ptr["rmax"]
        elif eg >= eb:
            axis, amin, amax = 1, ptr["gmin"], ptr["gmax"]
        else:
            axis, amin, amax = 2, ptr["bmin"], ptr["bmax"]
        hist2 = [0] * (amax - amin + 1)
        for k, c in cells_in(ptr):
            hist2[k[axis] - amin] += c
        # median: first i with cumsum >= total/2 (integer half)
        half = ptr["total"] // 2
        s = 0
        i = amin
        for j, c in enumerate(hist2):
            s += c
            if s >= half:
                i = amin + j
                break
        else:
            i = amax + 1
        if i == amin:
            i += 1
        new_cb = dict(ptr)
        lo_keys = ("rmax", "gmax", "bmax")[axis], ("rmin", "gmin", "bmin")[axis]
        new_cb[lo_keys[0]] = i - 1
        ptr[lo_keys[1]] = i
        new_cb["total"] = sum(hist2[: i - amin])
        ptr["total"] = sum(hist2[i - amin:])
        shrink(new_cb)
        if ptr["total"] > 0:
            shrink(ptr)
        used.insert(0, new_cb)
        n_free -= 1

    return [
        (((b["rmin"] + b["rmax"]) << shift) // 2,
         ((b["gmin"] + b["gmax"]) << shift) // 2,
         ((b["bmin"] + b["bmax"]) << shift) // 2)
        for b in used
    ]


def assign_expr_spark(palette: list[tuple[int, int, int]],
                      r: str, g: str, b: str) -> str:
    """Spark-SQL expression: nearest palette index of (r, g, b) —
    squared-RGB distance, lowest index on ties (the strictly-smaller
    scan rule of alg/gdaldither.cpp). Pure integer column math."""
    n = len(palette)
    pr = "array(" + ", ".join(str(p[0]) for p in palette) + ")"
    pg = "array(" + ", ".join(str(p[1]) for p in palette) + ")"
    pb = "array(" + ", ".join(str(p[2]) for p in palette) + ")"
    d2 = (f"((({r}) - element_at({pr}, i)) * (({r}) - element_at({pr}, i)) + "
          f"(({g}) - element_at({pg}, i)) * (({g}) - element_at({pg}, i)) + "
          f"(({b}) - element_at({pb}, i)) * (({b}) - element_at({pb}, i)))")
    return (f"array_min(transform(sequence(1, {n}), i -> "
            f"{d2} * {n} + (i - 1))) % {n}")


def assign_expr_duckdb(palette: list[tuple[int, int, int]],
                       r: str, g: str, b: str) -> str:
    """DuckDB twin of assign_expr_spark (identical integer sequence)."""
    n = len(palette)
    pr = "[" + ", ".join(str(p[0]) for p in palette) + "]"
    pg = "[" + ", ".join(str(p[1]) for p in palette) + "]"
    pb = "[" + ", ".join(str(p[2]) for p in palette) + "]"
    d2 = (f"((({r}) - {pr}[i]) * (({r}) - {pr}[i]) + "
          f"(({g}) - {pg}[i]) * (({g}) - {pg}[i]) + "
          f"(({b}) - {pb}[i]) * (({b}) - {pb}[i]))")
    return (f"list_min(list_transform(range(1, {n + 1}), i -> "
            f"{d2} * {n} + (i - 1))) % {n}")


def rgb2pct(df: DataFrame, palette: list[tuple[int, int, int]], *,
            r_col: str = "r", g_col: str = "g", b_col: str = "b",
            out_col: str = "idx") -> DataFrame:
    """Apply a color table: nearest-entry index per pixel (the
    non-dithered assignment slice of rgb2pct)."""
    return df.withColumn(
        out_col, F.expr(assign_expr_spark(palette, r_col, g_col, b_col))
    )


def pct2rgb(df: DataFrame, palette: list[tuple[int, int, int]], *,
            idx_col: str = "idx") -> DataFrame:
    """Expand a paletted band back to RGB (osgeo_utils/pct2rgb.py):
    pure array-literal lookup."""
    pr = "array(" + ", ".join(str(p[0]) for p in palette) + ")"
    pg = "array(" + ", ".join(str(p[1]) for p in palette) + ")"
    pb = "array(" + ", ".join(str(p[2]) for p in palette) + ")"
    at = f"CAST({idx_col} AS INT) + 1"
    return (
        df.withColumn("r", F.expr(f"element_at({pr}, {at})"))
          .withColumn("g", F.expr(f"element_at({pg}, {at})"))
          .withColumn("b", F.expr(f"element_at({pb}, {at})"))
    )


def dither_rgb2pct(df: DataFrame, palette: list[tuple[int, int, int]], *,
                   img_col: str = "img_id", x_col: str = "px",
                   y_col: str = "py", r_col: str = "r", g_col: str = "g",
                   b_col: str = "b") -> DataFrame:
    """GDALDitherRGB2PCT (alg/gdaldither.cpp:375-558): Floyd-Steinberg-
    style error-diffusion quantization to a color table, replayed with
    the reference's EXACT integer kernel. Scanning rows top-down and
    pixels left-to-right, with nSixth = nError/6 (C division truncating
    toward zero):

      right       += 2*nSixth      (applied in-line, clamped on read)
      below-left  += nSixth        (panError[i*3],   gdaldither.cpp:520)
      below       += nError - 5*nSixth  (panError[i*3+3])
      below-right  = nSixth        (panError[i*3+6])

    Clamping is two-stage, like the reference: the previous line's
    below-error is added and clamped 0..255 FIRST (stored back as a
    byte, gdaldither.cpp:380-390), then the in-line right error is
    added and clamped again at pixel read (gdaldither.cpp:407-412).
    Nearest color is the reference's FindNearestColor: LOWEST L1
    (sum-of-absolute-differences) distance, first index wins ties
    (gdaldither.cpp:666-683; the SSE path's _mm_sad_epu8 computes the
    same metric).

    The recurrence is inherently serial WITHIN an image (like the
    reference, which streams scanlines), so the distributed shape is
    one applyInPandas group PER IMAGE — images parallelize, scanlines
    don't. Returns (img, px, py, idx)."""
    import numpy as np
    import pandas as pd

    pal = np.asarray(palette, dtype=np.int64)  # (n, 3)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        xs = pdf[x_col].to_numpy().astype(np.int64)
        ys = pdf[y_col].to_numpy().astype(np.int64)
        x0, y0 = int(xs.min()), int(ys.min())
        w = int(xs.max()) - x0 + 1
        h = int(ys.max()) - y0 + 1
        img = np.zeros((h, w, 3), dtype=np.int64)
        for c, col in enumerate((r_col, g_col, b_col)):
            img[ys - y0, xs - x0, c] = pdf[col].to_numpy()
        idx = np.zeros((h, w), dtype=np.int64)
        # panError analog: slot s is read by next-line pixel s-1, so
        # pixel x writes slots x (below-left), x+1 (below), x+2
        # (below-right) — w+2 slots, zeroed per line like the memset
        below = np.zeros((w + 2, 3), dtype=np.int64)
        for y in range(h):
            # stage-1 clamp: previous-line error applied and stored
            # back as a byte before any in-line error
            line = np.clip(img[y] + below[1:w + 1], 0, 255)
            below = np.zeros((w + 2, 3), dtype=np.int64)
            last = np.zeros(3, dtype=np.int64)  # 2*nSixth from left
            for x in range(w):
                # stage-2 clamp: in-line right error on read
                v = np.clip(line[x] + last, 0, 255)
                d1 = np.abs(pal - v).sum(axis=1)
                k = int(np.argmin(d1))  # first min == reference's <
                idx[y, x] = k
                e = v - pal[k]
                # nSixth = nError/6, C truncation toward zero
                sixth = np.sign(e) * (np.abs(e) // 6)
                below[x] += sixth
                below[x + 1] += e - 5 * sixth
                below[x + 2] = sixth  # assignment, as the reference
                last = 2 * sixth
        out = pdf[[img_col]].iloc[:1].copy()
        rows = {
            img_col: np.repeat(out[img_col].iloc[0], h * w),
            "px": np.tile(np.arange(w) + x0, h),
            "py": np.repeat(np.arange(h) + y0, w),
            "idx": idx.reshape(-1),
        }
        return pd.DataFrame(rows)

    schema = f"{img_col} bigint, px bigint, py bigint, idx bigint"
    return df.groupBy(img_col).applyInPandas(lambda p: run(p), schema)
