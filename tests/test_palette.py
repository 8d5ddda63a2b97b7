"""Median-cut color table + rgb2pct/pct2rgb pins
(alg/gdalmediancut.cpp, alg/gdaldither.cpp nearest rule)."""
from __future__ import annotations

from gdal_spark.operators import palette as P


def _img(spark, colors_counts):
    rows = []
    i = 0
    for (r, g, b), n in colors_counts:
        for _ in range(n):
            rows.append((i, r, g, b))
            i += 1
    return spark.createDataFrame(rows, "pid bigint, r int, g int, b int")


def test_median_cut_separates_distinct_clusters(spark):
    # 4 well-separated colors, n_colors=4: every box collapses to a
    # single 5-bit cell -> palette = the quantized colors (v>>3<<3,
    # since entry = ((min+max)<<3)/2 with min==max)
    cc = [((10, 10, 10), 500), ((200, 30, 40), 300),
          ((40, 200, 30), 200), ((30, 40, 200), 100)]
    df = _img(spark, cc)
    pal = P.median_cut_palette(df, n_colors=4)
    assert len(pal) == 4
    expect = {(r >> 3 << 3, g >> 3 << 3, b >> 3 << 3) for (r, g, b), _ in cc}
    assert set(pal) == expect


def test_median_cut_single_color_stops_early(spark):
    df = _img(spark, [((100, 150, 200), 64)])
    pal = P.median_cut_palette(df, n_colors=8)
    # unsplittable initial box: one entry, the quantized color
    assert pal == [(96, 144, 200)]


def test_median_cut_split_semantics_two_colors_on_red_axis(spark):
    # total 10: red cells 0 (3 px) and 31 (7 px). half = 5; cumsum at
    # cell 0 is 3 < 5, reaches 5 at cell 31 -> i = 31: new box [0,30]
    # shrinks to cell 0, remaining box [31,31]. Entries: head = new box.
    df = _img(spark, [((0, 0, 0), 3), ((255, 0, 0), 7)])
    pal = P.median_cut_palette(df, n_colors=2)
    assert pal == [(0, 0, 0), (248, 0, 0)]


def test_median_cut_deterministic(spark):
    import random

    rng = random.Random(7)
    cc = [((rng.randrange(256), rng.randrange(256), rng.randrange(256)),
           1 + rng.randrange(20)) for _ in range(60)]
    df = _img(spark, cc)
    p1 = P.median_cut_palette(df, n_colors=16)
    p2 = P.median_cut_palette(df, n_colors=16)
    assert p1 == p2 and len(p1) == 16


def test_rgb2pct_nearest_and_tie_rule(spark):
    pal = [(0, 0, 0), (10, 0, 0), (20, 0, 0)]
    # r=5 is equidistant to entries 0 and 1 -> lowest index (0) wins
    df = spark.createDataFrame(
        [(0, 5, 0, 0), (1, 14, 0, 0), (2, 19, 0, 0)],
        "pid bigint, r int, g int, b int",
    )
    got = {r["pid"]: r["idx"] for r in P.rgb2pct(df, pal).collect()}
    assert got == {0: 0, 1: 1, 2: 2}


def test_pct2rgb_roundtrip_on_palette_colors(spark):
    pal = [(8, 5, 250), (24, 53, 235), (200, 21, 85)]
    df = spark.createDataFrame([(i,) for i in range(3)], "idx bigint")
    rows = {r["idx"]: (r["r"], r["g"], r["b"])
            for r in P.pct2rgb(df, pal).collect()}
    assert rows == {i: pal[i] for i in range(3)}


def test_dither_hand_computed_row(spark):
    # 1x4 row of mid-gray against a black/white table — the error
    # diffusion sequence hand-computed with the reference's /6 kernel
    # (gdaldither.cpp:516-520: right = 2*(err/6), C truncation):
    # p0: 128 -> white (L1 381 < 384), err -127, sixth -21, right -42
    # p1: clamp(128-42)=86 -> black, err 86, sixth 14, right 28
    # p2: 128+28=156 -> white, err -99, sixth -16, right -32
    # p3: 128-32=96 -> black
    from gdal_spark.operators import palette as P

    rows = [(7, x, 0, 128, 128, 128) for x in range(4)]
    df = spark.createDataFrame(
        rows, "img_id bigint, px bigint, py bigint, r bigint, g bigint, b bigint")
    out = P.dither_rgb2pct(df, [(0, 0, 0), (255, 255, 255)]) \
        .orderBy("px").collect()
    assert [r["idx"] for r in out] == [1, 0, 1, 0]


def _dither_scalar_replay(img, pal):
    """Independent straight-line transcription of the reference loop
    (gdaldither.cpp:375-558): byte buffers, panError[(w+2)*3] ints,
    per-channel scalar ops — no numpy vector shortcuts. Used as the
    oracle for the vectorized operator."""
    h = len(img)
    w = len(img[0])
    pan = [0] * ((w + 2) * 3)
    out = [[0] * w for _ in range(h)]
    line = [[0, 0, 0] for _ in range(w)]
    for y in range(h):
        for i in range(w):
            for c in range(3):
                line[i][c] = max(0, min(255, img[y][i][c] + pan[i * 3 + c + 3]))
        pan = [0] * ((w + 2) * 3)
        last = [0, 0, 0]
        for i in range(w):
            vals = [max(0, min(255, line[i][c] + last[c])) for c in range(3)]
            best_d, best_k = 768, 0
            for k, p in enumerate(pal):
                d = (abs(vals[0] - p[0]) + abs(vals[1] - p[1])
                     + abs(vals[2] - p[2]))
                if d < best_d:
                    best_d, best_k = d, k
            out[y][i] = best_k
            for c in range(3):
                err = vals[c] - pal[best_k][c]
                sixth = int(err / 6)  # python int() truncates like C
                pan[i * 3 + c] += sixth
                pan[i * 3 + c + 6] = sixth
                pan[i * 3 + c + 3] += err - 5 * sixth
                last[c] = 2 * sixth
    return out


def test_dither_matches_scalar_reference_replay(spark):
    # deterministic 12x9 RGB fixture with gradients + noise, 6-color
    # palette: the vectorized operator must match the scalar replay of
    # the reference loop pixel-for-pixel (kernel taps, both clamp
    # stages, and the L1 nearest rule all covered)
    from gdal_spark.operators import palette as P

    w, h = 12, 9
    img = [[[(x * 37 + y * 91 + c * 53) % 256 for c in range(3)]
            for x in range(w)] for y in range(h)]
    pal = [(0, 0, 0), (255, 255, 255), (200, 30, 30), (30, 200, 30),
           (30, 30, 200), (128, 128, 128)]
    expected = _dither_scalar_replay(img, pal)
    rows = [(3, x, y, *img[y][x]) for y in range(h) for x in range(w)]
    df = spark.createDataFrame(
        rows, "img_id bigint, px bigint, py bigint, r bigint, g bigint, b bigint")
    got = {(r["px"], r["py"]): r["idx"]
           for r in P.dither_rgb2pct(df, pal).collect()}
    for y in range(h):
        for x in range(w):
            assert got[(x, y)] == expected[y][x], (x, y)


def test_dither_preserves_mean_better_than_nearest(spark):
    from gdal_spark.operators import palette as P

    # 16x16 uniform 100-gray: nearest-assignment gives all-black
    # (100 < 127.5), mean error 100; dithering must mix black/white
    # so the reconstructed mean lands near 100
    rows = [(1, x, y, 100, 100, 100) for y in range(16) for x in range(16)]
    df = spark.createDataFrame(
        rows, "img_id bigint, px bigint, py bigint, r bigint, g bigint, b bigint")
    pal = [(0, 0, 0), (255, 255, 255)]
    out = P.dither_rgb2pct(df, pal).collect()
    mean = sum(pal[r["idx"]][0] for r in out) / len(out)
    assert abs(mean - 100.0) < 10.0
    nearest = P.rgb2pct(df, pal).collect()
    mean_n = sum(pal[r["idx"]][0] for r in nearest) / len(nearest)
    assert mean_n == 0.0
