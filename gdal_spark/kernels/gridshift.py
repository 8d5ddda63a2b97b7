"""Horizontal grid-shift datum transformation (the NTv2 path).

The reference reprojects grid-based datums (NAD27, many national
frames) through PROJ's +proj=hgridshift step (ogr/ogrct.cpp:2254
building the PROJ pipeline; PROJ src/transformations/hgridshift.cpp +
src/grids.cpp): a regular lat/lon grid of per-node (dlat, dlon)
offsets in ARC-SECONDS, bilinearly interpolated at the input point;

  forward:  out = in + interp(grid, in)
  inverse:  fixed-point iteration on the forward
            (hgridshift.cpp reverse: guess = pt - interp(grid, guess),
            iterated until the forward of the guess matches pt within
            tolerance, bounded iterations)

NTv2 conventions implemented (public format, used by PROJ/GDAL):
  - node (0, 0) at the grid's SOUTH-EAST corner, latitude rows
    increasing northward, columns increasing WESTWARD;
  - longitude shift values are positive WEST (subtract from
    east-positive longitude);
  - shifts stored in arc-seconds.

The sandbox has no PROJ wheel and no real .gsb files (probed every
round), so the grid itself is a deterministic synthetic fixture —
exactly the round's "synthesise deterministically at small scale"
rule — with closed-form node values so the DuckDB oracle can replay
the bilinear + iteration chain analytically (the dem_fixture
pattern). Swapping in a parsed real NTv2 sub-grid changes only the
GridShift constructor inputs.
"""
from __future__ import annotations

import numpy as np

ARCSEC = 1.0 / 3600.0
# PROJ hgridshift reverse: bounded fixed-point iteration. PROJ uses
# tolerance-based exit (grids.cpp apply_shift_grid reverse, epsilon on
# the forward residual); a fixed unrolled count with a final
# convergence mask is the deterministic, oracle-replayable equivalent.
INV_MAX_ITER = 6
INV_TOL_DEG = 1e-12


class GridShift:
    """A loaded NTv2-style sub-grid: dlat/dlon node arrays (arcsec,
    shape (nrows, ncols)), SE-corner origin (lat0, lon0_west in
    degrees; lon0_west is POSITIVE-WEST like the format), node
    spacing (dlat_deg, dlon_deg > 0, lat rows northward / lon columns
    westward)."""

    def __init__(self, dlat, dlon, *, lat0: float, lon0_west: float,
                 dlat_deg: float, dlon_deg: float):
        self.dlat = np.asarray(dlat, dtype=np.float64)
        self.dlon = np.asarray(dlon, dtype=np.float64)
        assert self.dlat.shape == self.dlon.shape and self.dlat.ndim == 2
        self.lat0 = float(lat0)
        self.lon0_west = float(lon0_west)
        self.dlat_deg = float(dlat_deg)
        self.dlon_deg = float(dlon_deg)

    @property
    def shape(self):
        return self.dlat.shape


def _interp(g: GridShift, lon, lat):
    """Bilinear (dlat, dlon) arcsec at east-positive (lon, lat).
    Returns (dlat_as, dlon_as, inside). Outside the grid -> (0, 0,
    False): PROJ treats out-of-grid points as untransformable; the
    callers mask on `inside`."""
    nrows, ncols = g.shape
    # fractional node coords; columns run WEST from the SE corner
    fy = (lat - g.lat0) / g.dlat_deg
    fx = ((-lon) - g.lon0_west) / g.dlon_deg
    inside = (fx >= 0.0) & (fx <= ncols - 1) & (fy >= 0.0) & (fy <= nrows - 1)
    x0 = np.minimum(np.maximum(np.floor(fx), 0.0), ncols - 2).astype(np.int64)
    y0 = np.minimum(np.maximum(np.floor(fy), 0.0), nrows - 2).astype(np.int64)
    wx = np.minimum(np.maximum(fx - x0, 0.0), 1.0)
    wy = np.minimum(np.maximum(fy - y0, 0.0), 1.0)

    def bil(a):
        return (a[y0, x0] * (1 - wx) * (1 - wy)
                + a[y0, x0 + 1] * wx * (1 - wy)
                + a[y0 + 1, x0] * (1 - wx) * wy
                + a[y0 + 1, x0 + 1] * wx * wy)

    return bil(g.dlat), bil(g.dlon), inside


def gridshift_forward(g: GridShift, lon, lat):
    """Source-datum -> target-datum: add the interpolated shift
    (lon shift positive WEST -> subtract). NaN outside the grid."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    dla, dlo, ok = _interp(g, lon, lat)
    out_lon = lon - dlo * ARCSEC
    out_lat = lat + dla * ARCSEC
    return (np.where(ok, out_lon, np.nan), np.where(ok, out_lat, np.nan))


def gridshift_inverse(g: GridShift, lon, lat, *,
                      max_iter: int = INV_MAX_ITER,
                      tol_deg: float = INV_TOL_DEG):
    """Target-datum -> source-datum: fixed-point iteration
    (hgridshift reverse). Seed with the shift AT the target point,
    then re-evaluate the shift at each guess; a point is converged
    when consecutive guesses move < tol. Unconverged / off-grid
    points -> NaN."""
    tlon = np.asarray(lon, dtype=np.float64)
    tlat = np.asarray(lat, dtype=np.float64)
    glon = tlon.copy()
    glat = tlat.copy()
    alive = np.ones(tlon.shape, dtype=bool)
    done = np.zeros(tlon.shape, dtype=bool)
    for _ in range(max_iter):
        dla, dlo, ok = _interp(g, glon, glat)
        alive = alive & ok
        nlon = tlon + dlo * ARCSEC
        nlat = tlat - dla * ARCSEC
        moved = np.maximum(np.abs(nlon - glon), np.abs(nlat - glat))
        step = alive & ~done
        glon = np.where(step, nlon, glon)
        glat = np.where(step, nlat, glat)
        done = done | (step & (moved < tol_deg))
    return (np.where(alive & done, glon, np.nan),
            np.where(alive & done, glat, np.nan))


# ------------------------------------------------------------- fixture

FIX_NROWS = 81
FIX_NCOLS = 101
FIX_LAT0 = 38.0          # SE corner
FIX_LON0_WEST = 70.0     # = 70 deg W
FIX_DLAT = 0.1
FIX_DLON = 0.1


def gridshift_fixture() -> GridShift:
    """Deterministic NAD27-plausible sub-grid over the eastern US
    (38..46N, 70..80W): shifts of a few tenths of an arcsecond with
    smooth spatial structure, every node value exact integer-derived
    double arithmetic so the oracle recomputes cells analytically.
      dlat(r, c) = 0.30 + 0.004*r - 0.002*c + 0.05*((2r + 3c) % 5)
      dlon(r, c) = -1.20 + 0.003*r + 0.005*c - 0.04*((r + 2c) % 7)
    (arcseconds)."""
    r = np.arange(FIX_NROWS, dtype=np.int64)[:, None]
    c = np.arange(FIX_NCOLS, dtype=np.int64)[None, :]
    dlat = 0.30 + 0.004 * r - 0.002 * c + 0.05 * ((2 * r + 3 * c) % 5)
    dlon = -1.20 + 0.003 * r + 0.005 * c - 0.04 * ((r + 2 * c) % 7)
    return GridShift(dlat, dlon, lat0=FIX_LAT0, lon0_west=FIX_LON0_WEST,
                     dlat_deg=FIX_DLAT, dlon_deg=FIX_DLON)


def fixture_dlat_sql(r: str, c: str) -> str:
    return (f"(0.30 + 0.004 * CAST({r} AS DOUBLE)"
            f" - 0.002 * CAST({c} AS DOUBLE)"
            f" + 0.05 * CAST((2 * {r} + 3 * {c}) % 5 AS DOUBLE))")


def fixture_dlon_sql(r: str, c: str) -> str:
    return (f"(-1.20 + 0.003 * CAST({r} AS DOUBLE)"
            f" + 0.005 * CAST({c} AS DOUBLE)"
            f" - 0.04 * CAST(({r} + 2 * {c}) % 7 AS DOUBLE))")


def _r(x: float) -> str:
    return repr(float(x))


def _interp_cols(g: GridShift, lon: str, lat: str) -> str:
    """Select-list fragment: fractional coords + corner indices/weights
    + `inside` from east-positive (lon, lat) columns."""
    nrows, ncols = g.shape
    fy = f"((({lat}) - {_r(g.lat0)}) / {_r(g.dlat_deg)})"
    fx = f"(((-({lon})) - {_r(g.lon0_west)}) / {_r(g.dlon_deg)})"
    return (
        f"({fx} >= 0.0 AND {fx} <= {_r(ncols - 1)} AND {fy} >= 0.0"
        f" AND {fy} <= {_r(nrows - 1)}) AS gs_ok, "
        f"CAST(least(greatest(floor({fx}), 0.0), {_r(ncols - 2)}) AS BIGINT)"
        f" AS gs_x0, "
        f"CAST(least(greatest(floor({fy}), 0.0), {_r(nrows - 2)}) AS BIGINT)"
        f" AS gs_y0, "
        f"least(greatest({fx} - least(greatest(floor({fx}), 0.0),"
        f" {_r(ncols - 2)}), 0.0), 1.0) AS gs_wx, "
        f"least(greatest({fy} - least(greatest(floor({fy}), 0.0),"
        f" {_r(nrows - 2)}), 0.0), 1.0) AS gs_wy")


def _bil_sql(h_sql) -> str:
    x0, y0, wx, wy = "gs_x0", "gs_y0", "gs_wx", "gs_wy"
    x1, y1 = f"({x0} + 1)", f"({y0} + 1)"
    return (f"({h_sql(y0, x0)} * (1.0 - {wx}) * (1.0 - {wy})"
            f" + {h_sql(y0, x1)} * {wx} * (1.0 - {wy})"
            f" + {h_sql(y1, x0)} * (1.0 - {wx}) * {wy}"
            f" + {h_sql(y1, x1)} * {wx} * {wy})")


def gridshift_fwd_sql_ctes(g: GridShift, src: str, *, lon: str = "lon",
                           lat: str = "lat", keep: str = "id") -> str:
    """Final CTE `gs_fwd` (keep, lon, lat) — NaN off-grid."""
    return f"""
gsf_a AS (
  SELECT {keep}, ({lon}) AS lon, ({lat}) AS lat,
         {_interp_cols(g, lon, lat)}
  FROM {src}
),
gsf_b AS (
  SELECT {keep}, lon, lat, gs_ok,
         {_bil_sql(fixture_dlat_sql)} AS dla,
         {_bil_sql(fixture_dlon_sql)} AS dlo
  FROM gsf_a
),
gs_fwd AS (
  SELECT {keep},
         CASE WHEN gs_ok THEN lon - dlo * {_r(ARCSEC)}
              ELSE CAST('nan' AS DOUBLE) END AS lon,
         CASE WHEN gs_ok THEN lat + dla * {_r(ARCSEC)}
              ELSE CAST('nan' AS DOUBLE) END AS lat
  FROM gsf_b
)""".strip()


def gridshift_inv_sql_ctes(g: GridShift, src: str, *, lon: str = "tlon",
                           lat: str = "tlat", keep: str = "id",
                           max_iter: int = INV_MAX_ITER,
                           tol_deg: float = INV_TOL_DEG) -> str:
    """CTE chain unrolling gridshift_inverse's masked fixed-point
    iterations; final CTE `gs_inv` (keep, lon, lat)."""
    tol = _r(tol_deg)
    parts = [f"""
gsi0 AS (
  SELECT {keep}, ({lon}) AS tlon, ({lat}) AS tlat,
         ({lon}) AS glon, ({lat}) AS glat,
         TRUE AS alive, FALSE AS done
  FROM {src}
)"""]
    for i in range(max_iter):
        parts.append(f"""
gsi_a{i} AS (
  SELECT {keep}, tlon, tlat, glon, glat, alive, done,
         {_interp_cols(g, 'glon', 'glat')}
  FROM gsi{i}
),
gsi_b{i} AS (
  SELECT {keep}, tlon, tlat, glon, glat, (alive AND gs_ok) AS alive, done,
         tlon + {_bil_sql(fixture_dlon_sql)} * {_r(ARCSEC)} AS nlon,
         tlat - {_bil_sql(fixture_dlat_sql)} * {_r(ARCSEC)} AS nlat
  FROM gsi_a{i}
),
gsi_c{i} AS (
  SELECT {keep}, tlon, tlat, alive, done, glon, glat, nlon, nlat,
         greatest(abs(nlon - glon), abs(nlat - glat)) AS moved,
         (alive AND NOT done) AS step
  FROM gsi_b{i}
),
gsi{i + 1} AS (
  SELECT {keep}, tlon, tlat,
         CASE WHEN step THEN nlon ELSE glon END AS glon,
         CASE WHEN step THEN nlat ELSE glat END AS glat,
         alive, (done OR (step AND moved < {tol})) AS done
  FROM gsi_c{i}
)""")
    parts.append(f"""
gs_inv AS (
  SELECT {keep},
         CASE WHEN alive AND done THEN glon
              ELSE CAST('nan' AS DOUBLE) END AS lon,
         CASE WHEN alive AND done THEN glat
              ELSE CAST('nan' AS DOUBLE) END AS lat
  FROM gsi{max_iter}
)""")
    return ",".join(p.strip() for p in parts)


# ----------------------------------------------- NTv2 .gsb binary I/O

# NTv2 grid-shift file layout (public format, as read by PROJ
# src/grids.cpp NTv2Grid and GDAL frmts/ntv2): 16-byte records, each
# an 8-char ASCII name + an 8-byte value (double, or int32 + 4 pad
# bytes for the *REC/GS_COUNT counters). Overview header (11 records),
# per-subgrid header (11 records), then GS_COUNT data records of four
# float32s (lat shift, lon shift, lat accuracy, lon accuracy),
# arc-seconds, row-major from the SE corner — columns WESTWARD, rows
# NORTHWARD. Longitudes in the header are positive-WEST arcseconds.

def write_gsb(path: str, g: GridShift, *, name: str = "SYNTHGRD",
              little_endian: bool = True) -> None:
    """Serialize a GridShift as a single-subgrid NTv2 .gsb file
    (accuracy fields zero). Both byte orders exist in the wild
    (Canadian originals big-endian, many national grids little);
    the parser sniffs NUM_OREC."""
    import struct
    e = "<" if little_endian else ">"
    nrows, ncols = g.shape

    def rec_i(nm, v):
        return nm.ljust(8).encode() + struct.pack(e + "i4x", v)

    def rec_d(nm, v):
        return nm.ljust(8).encode() + struct.pack(e + "d", v)

    def rec_s(nm, v):
        return nm.ljust(8).encode() + v.ljust(8).encode()

    s_lat = g.lat0 * 3600.0
    n_lat = (g.lat0 + (nrows - 1) * g.dlat_deg) * 3600.0
    e_long = g.lon0_west * 3600.0
    w_long = (g.lon0_west + (ncols - 1) * g.dlon_deg) * 3600.0
    out = [
        rec_i("NUM_OREC", 11), rec_i("NUM_SREC", 11), rec_i("NUM_FILE", 1),
        rec_s("GS_TYPE", "SECONDS"), rec_s("VERSION", "NTv2.0"),
        rec_s("SYSTEM_F", "NAD27"), rec_s("SYSTEM_T", "NAD83"),
        rec_d("MAJOR_F", 6378206.4), rec_d("MINOR_F", 6356583.8),
        rec_d("MAJOR_T", 6378137.0), rec_d("MINOR_T", 6356752.314),
        rec_s("SUB_NAME", name), rec_s("PARENT", "NONE"),
        rec_s("CREATED", "00000000"), rec_s("UPDATED", "00000000"),
        rec_d("S_LAT", s_lat), rec_d("N_LAT", n_lat),
        rec_d("E_LONG", e_long), rec_d("W_LONG", w_long),
        rec_d("LAT_INC", g.dlat_deg * 3600.0),
        rec_d("LONG_INC", g.dlon_deg * 3600.0),
        rec_i("GS_COUNT", nrows * ncols),
    ]
    data = np.zeros((nrows * ncols, 4), dtype=(e + "f4"))
    data[:, 0] = g.dlat.ravel().astype(np.float32)
    data[:, 1] = g.dlon.ravel().astype(np.float32)
    with open(path, "wb") as f:
        f.write(b"".join(out))
        f.write(data.tobytes())


def read_gsb(path: str, *, subgrid: int = 0) -> GridShift:
    """Parse an NTv2 .gsb file into a GridShift (shift values only —
    accuracies dropped, like PROJ). Handles either byte order and
    multi-subgrid files (pick by index, parents first — nesting
    resolution beyond pick-one is out of scope, as is the SECONDS/
    MINUTES/DEGREES GS_TYPE switch for non-SECONDS files)."""
    import struct
    with open(path, "rb") as f:
        raw = f.read()
    # sniff byte order from NUM_OREC's int32 (always 11)
    for e in ("<", ">"):
        if struct.unpack_from(e + "i", raw, 8)[0] == 11:
            break
    else:
        raise ValueError("not an NTv2 file (NUM_OREC != 11)")

    def name_at(off):
        return raw[off:off + 8].decode("ascii", "replace").strip()

    hdr = {}
    off = 0
    for _ in range(11):
        nm = name_at(off)
        hdr[nm] = raw[off + 8:off + 16]
        off += 16
    n_file = struct.unpack(e + "i4x", hdr["NUM_FILE"])[0]
    gs_type = hdr["GS_TYPE"].decode().strip()
    if gs_type != "SECONDS":
        raise ValueError(f"GS_TYPE {gs_type!r} unsupported")
    for idx in range(n_file):
        sub = {}
        for _ in range(11):
            nm = name_at(off)
            sub[nm] = raw[off + 8:off + 16]
            off += 16
        cnt = struct.unpack(e + "i4x", sub["GS_COUNT"])[0]
        if idx == subgrid:
            d = {k: struct.unpack(e + "d", sub[k])[0]
                 for k in ("S_LAT", "N_LAT", "E_LONG", "W_LONG",
                           "LAT_INC", "LONG_INC")}
            lat_inc, lon_inc = d["LAT_INC"], d["LONG_INC"]
            nrows = int(round((d["N_LAT"] - d["S_LAT"]) / lat_inc)) + 1
            ncols = int(round((d["W_LONG"] - d["E_LONG"]) / lon_inc)) + 1
            if nrows * ncols != cnt:
                raise ValueError("GS_COUNT inconsistent with extents")
            vals = np.frombuffer(raw, dtype=(e + "f4"), count=cnt * 4,
                                 offset=off).reshape(cnt, 4)
            return GridShift(
                vals[:, 0].astype(np.float64).reshape(nrows, ncols),
                vals[:, 1].astype(np.float64).reshape(nrows, ncols),
                lat0=d["S_LAT"] / 3600.0, lon0_west=d["E_LONG"] / 3600.0,
                dlat_deg=lat_inc / 3600.0, dlon_deg=lon_inc / 3600.0)
        off += 16 * cnt
    raise IndexError(f"subgrid {subgrid} not in file ({n_file} subgrids)")
