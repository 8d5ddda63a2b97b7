"""Grid-shift datum transformation (kernels.gridshift) vs the PROJ
hgridshift semantics (forward add-interpolated-shift, reverse bounded
fixed-point; NTv2 conventions: SE origin, west-positive lon shifts,
arc-seconds)."""
from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.kernels import gridshift as GS


@pytest.fixture(scope="module")
def grid():
    return GS.gridshift_fixture()


def test_forward_applies_node_shift_exactly(grid):
    # at a grid NODE the bilinear weights collapse: shift == node value
    r, c = 10, 20
    lat = GS.FIX_LAT0 + r * GS.FIX_DLAT
    lon = -(GS.FIX_LON0_WEST + c * GS.FIX_DLON)
    flon, flat = GS.gridshift_forward(grid, np.array([lon]), np.array([lat]))
    assert abs((flat[0] - lat) * 3600.0 - grid.dlat[r, c]) < 1e-9
    assert abs((lon - flon[0]) * 3600.0 - grid.dlon[r, c]) < 1e-9


def test_roundtrip_converges(grid):
    ids = np.arange(0, 12000, 7)
    lon = -79.5 + (ids % 300).astype(np.float64) * 0.03
    lat = 38.3 + ((ids // 300) % 250).astype(np.float64) * 0.03
    flon, flat = GS.gridshift_forward(grid, lon, lat)
    assert not np.isnan(flon).any()
    ilon, ilat = GS.gridshift_inverse(grid, flon, flat)
    assert not np.isnan(ilon).any()
    assert np.abs(ilon - lon).max() < 1e-11
    assert np.abs(ilat - lat).max() < 1e-11


def test_off_grid_is_nan(grid):
    flon, _ = GS.gridshift_forward(grid, np.array([-60.0, -75.0]),
                                   np.array([39.0, 39.0]))
    assert np.isnan(flon[0]) and not np.isnan(flon[1])
    ilon, _ = GS.gridshift_inverse(grid, np.array([-60.0]), np.array([39.0]))
    assert np.isnan(ilon[0])


def test_oracle_bit_exact(grid):
    duckdb = pytest.importorskip("duckdb")
    import pandas as pd
    ids = np.arange(0, 12000, 23)
    lon = -79.5 + (ids % 300).astype(np.float64) * 0.03
    lat = 38.3 + ((ids // 300) % 250).astype(np.float64) * 0.03
    flon, flat = GS.gridshift_forward(grid, lon, lat)
    ilon, ilat = GS.gridshift_inverse(grid, flon, flat)
    con = duckdb.connect()
    con.register("pts", pd.DataFrame({"id": ids, "lon": lon, "lat": lat}))
    fwd = GS.gridshift_fwd_sql_ctes(grid, "pts")
    got = con.execute(
        f"WITH {fwd} SELECT lon, lat FROM gs_fwd ORDER BY id").fetchnumpy()
    assert np.array_equal(got["lon"], flon)
    assert np.array_equal(got["lat"], flat)
    inv = GS.gridshift_inv_sql_ctes(
        grid, "(SELECT id, lon AS tlon, lat AS tlat FROM gs_fwd)")
    got2 = con.execute(
        f"WITH {fwd}, {inv} SELECT lon, lat FROM gs_inv ORDER BY id"
    ).fetchnumpy()
    assert np.array_equal(got2["lon"], ilon)
    assert np.array_equal(got2["lat"], ilat)


def test_gsb_roundtrip_both_byte_orders(grid, tmp_path):
    # NTv2 .gsb writer/parser: header + float32 data records, either
    # byte order (sniffed from NUM_OREC); shifts survive at f32
    # precision and applying the parsed grid matches the fixture grid
    # quantized to f32
    for le in (True, False):
        p = str(tmp_path / f"t_{le}.gsb")
        GS.write_gsb(p, grid, little_endian=le)
        back = GS.read_gsb(p)
        assert back.shape == grid.shape
        assert np.array_equal(
            back.dlat, grid.dlat.astype(np.float32).astype(np.float64))
        assert (back.lat0, back.lon0_west) == (grid.lat0, grid.lon0_west)
    lon = np.array([-75.123, -71.009])
    lat = np.array([39.456, 44.87])
    f32 = GS.GridShift(grid.dlat.astype(np.float32),
                       grid.dlon.astype(np.float32),
                       lat0=grid.lat0, lon0_west=grid.lon0_west,
                       dlat_deg=grid.dlat_deg, dlon_deg=grid.dlon_deg)
    a = GS.gridshift_forward(back, lon, lat)
    b = GS.gridshift_forward(f32, lon, lat)
    assert np.array_equal(a[0], b[0]) and np.array_equal(a[1], b[1])


def test_gsb_rejects_garbage(tmp_path):
    p = str(tmp_path / "bad.gsb")
    with open(p, "wb") as f:
        f.write(b"\x00" * 64)
    with pytest.raises(ValueError):
        GS.read_gsb(p)


def test_spark_operators_match_kernel(spark, grid):
    import pandas as pd
    from gdal_spark.operators import reproject as RP

    ids = np.arange(0, 3000, 13)
    lon = -79.5 + (ids % 300).astype(np.float64) * 0.03
    lat = 38.3 + ((ids // 300) % 250).astype(np.float64) * 0.03
    df = spark.createDataFrame(pd.DataFrame({"id": ids, "lon": lon, "lat": lat}))
    out = RP.gridshift_inverse_cols(
        RP.gridshift_forward_cols(df, grid), grid).orderBy("id").toPandas()
    flon, flat = GS.gridshift_forward(grid, lon, lat)
    ilon, ilat = GS.gridshift_inverse(grid, flon, flat)
    assert np.array_equal(out["lon_sh"].to_numpy(), flon)
    assert np.array_equal(out["lat_sh"].to_numpy(), flat)
    assert np.array_equal(out["lon_inv"].to_numpy(), ilon)
    assert np.array_equal(out["lat_inv"].to_numpy(), ilat)
