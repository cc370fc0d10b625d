"""
Benchmark harness for marex_tpu — all five BASELINE.json configs.

Headline metric: end-to-end detect+track wall-clock with the reference's
PRODUCTION tracking config (allow_merging=True + nn_partitioning, the
default of examples/batch jobs/submit_track.sh:20-28), reported as
gridpoint-days/sec/chip. The detail block carries per-config throughputs:

  1. fixed_baseline + global_extreme, tracker(allow_merging=False)
  2. shifting_baseline + hobday_extreme (production detect path)
  3. regional grid (open boundaries, area_filter_absolute)
  4. allow_merging=True split/merge with overlap partitioning  [headline]
  5. unstructured mesh (neighbour-list morphology + CCL)

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "detail": {...}}

``vs_baseline`` compares against the reference's implied production
throughput: the marEx batch jobs process ~0.25 deg global daily data with 128
Dask workers in 39 min (detect, examples/batch jobs/run_detect.py:29-33) plus
179 min (track, submit_track.sh:2-9) per ~40-year dataset ->
~40*365*1036800 / 13080 s ~= 1.16e6 gridpoint-days/s on 128 cores.

Size knobs (defaults sized for one v5e chip, ~10 min all-in):
  MAREX_BENCH_YEARS (3), MAREX_BENCH_NY (360), MAREX_BENCH_NX (720),
  MAREX_BENCH_CELLS (98304), MAREX_BENCH_CONFIGS (comma list, default all;
  config 6 = merge-dense stress reporting the merge-mode overhead factor).
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import time

import numpy as np
import pandas as pd

# Implied reference throughput (gridpoint-days per second, 128-core Dask)
BASELINE_THROUGHPUT = 40 * 365 * 720 * 1440 / (39 * 60 + 179 * 60)

_silence = contextlib.redirect_stdout(io.StringIO())


def make_data(n_years: int, ny: int, nx: int, seed: int = 0, lat_range=(-89.5, 89.5), lon_range=(0.0, 360.0)):
    from marex_tpu.core.field import Field

    rng = np.random.default_rng(seed)
    times = pd.date_range("2000-01-01", periods=int(n_years * 365.25), freq="D").to_numpy()
    T = len(times)
    lat = np.linspace(lat_range[0], lat_range[1], ny)
    global_lon = lon_range == (0.0, 360.0)
    lon = np.linspace(lon_range[0], lon_range[1], nx, endpoint=not global_lon)
    doy = pd.DatetimeIndex(times).dayofyear.to_numpy()

    seasonal = 3.0 * np.cos(2 * np.pi * (doy[:, None, None] - 30) / 365.25) * np.cos(np.deg2rad(lat))[None, :, None]
    base = (15.0 + 10.0 * np.cos(np.deg2rad(lat))[None, :, None]).astype(np.float32)
    noise = rng.standard_normal((T, ny, nx)).astype(np.float32)
    for k in range(1, T):
        noise[k] = 0.8 * noise[k - 1] + 0.6 * noise[k]
    sst = (base + seasonal + noise).astype(np.float32)
    sst = np.ascontiguousarray(sst + 0 * lon[None, None, :], dtype=np.float32)
    # coherent drifting warm blobs (days 60-140 of every year): real marine
    # heatwaves are spatially coherent, and the R_fill opening should never
    # annihilate every event regardless of the bench scale
    yy, xx = np.mgrid[0:ny, 0:nx]
    r = max(min(ny, nx) // 8, 12)  # must survive the R_fill=8 opening at smoke sizes
    years = pd.DatetimeIndex(times).year.to_numpy()
    y0 = years.min()
    for t in range(T):
        d = int(doy[t])
        if 60 <= d <= 140:
            # position drifts with the YEAR so a shifting-baseline
            # climatology can never absorb the event
            yr = int(years[t] - y0)
            cy = ny // 2 + ((yr % 3) - 1) * (ny // 6)
            cx = (nx // 4 + yr * (nx // 5) + (d - 60)) % nx
            dx = np.minimum(np.abs(xx - cx), nx - np.abs(xx - cx))
            blob = (yy - cy) ** 2 + dx**2 <= r * r
            sst[t][blob] += 4.0
    # land block
    sst[:, ny // 4 : ny // 4 + ny // 8, nx // 8 : nx // 4] = np.nan
    return Field(sst, ("time", "lat", "lon"), coords={"time": times, "lat": lat, "lon": lon}, name="sst")


def make_unstructured(n_years: int, n_cells: int, seed: int = 1):
    """Synthetic triangular mesh: structured vertices triangulated into a
    (3, C) neighbour table (two triangles per quad), spherical cell areas."""
    from marex_tpu.core.field import Field

    rng = np.random.default_rng(seed)
    # grid of 2*gy*gx triangles ~= n_cells
    gx = int(np.sqrt(n_cells / 2))
    gy = max(n_cells // (2 * gx), 2)
    C = 2 * gy * gx

    def tri_id(j, i, upper):
        return 2 * ((j % gy) * gx + (i % gx)) + upper

    nb = np.full((3, C), 0, dtype=np.int32)
    lat_c = np.empty(C, np.float64)
    lon_c = np.empty(C, np.float64)
    lat_g = np.linspace(-60, 60, gy)
    lon_g = np.linspace(0, 360, gx, endpoint=False)
    for j in range(gy):
        for i in range(gx):
            lo = tri_id(j, i, 0)
            up = tri_id(j, i, 1)
            # lower triangle neighbours: upper of same quad, left quad's upper, below quad's upper
            nb[0, lo] = up
            nb[1, lo] = tri_id(j, i - 1, 1)
            nb[2, lo] = tri_id(j - 1, i, 1)
            nb[0, up] = lo
            nb[1, up] = tri_id(j, i + 1, 0)
            nb[2, up] = tri_id(j + 1, i, 0)
            lat_c[lo] = lat_g[j] - 0.2
            lat_c[up] = lat_g[j] + 0.2
            lon_c[lo] = lon_g[i]
            lon_c[up] = lon_g[i] + 0.2
    nb = nb + 1  # 1-based like ICON output

    times = pd.date_range("2000-01-01", periods=int(n_years * 365.25), freq="D").to_numpy()
    T = len(times)
    doy = pd.DatetimeIndex(times).dayofyear.to_numpy()
    seasonal = 3.0 * np.cos(2 * np.pi * (doy[:, None] - 30) / 365.25) * np.cos(np.deg2rad(lat_c))[None, :]
    noise = rng.standard_normal((T, C)).astype(np.float32)
    for k in range(1, T):
        noise[k] = 0.8 * noise[k - 1] + 0.6 * noise[k]
    sst = (15.0 + seasonal + noise).astype(np.float32)
    # coherent drifting warm patch each year (see make_data)
    years = pd.DatetimeIndex(times).year.to_numpy()
    y0 = years.min()
    for t in range(T):
        d = int(doy[t])
        if 60 <= d <= 140:
            clon = (30.0 + (years[t] - y0) * 73.0 + (d - 60) * 1.5) % 360.0
            dlon = np.minimum(np.abs(lon_c - clon), 360.0 - np.abs(lon_c - clon))
            # sized to stay well above the 50-cell quartile pre-filter even
            # at smoke-test mesh sizes
            patch = (np.abs(lat_c) < 25.0) & (dlon < 40.0)
            sst[t][patch] += 4.0

    coords = {"time": times, "lat": ("ncells", lat_c), "lon": ("ncells", lon_c)}
    da = Field(sst, ("time", "ncells"), coords=coords, name="sst")
    nbf = Field(nb, ("nv", "ncells"), coords={"lat": ("ncells", lat_c), "lon": ("ncells", lon_c)}, name="neighbours")
    areas = Field(np.full(C, 1.0e7, np.float32), ("ncells",), name="cell_areas")
    return da, nbf, areas


def _stage(da):
    import jax.numpy as jnp

    from marex_tpu import Field

    dev = jnp.asarray(np.asarray(da.values, dtype=np.float32))
    dev.block_until_ready()
    return Field(dev, da.dims, da.coords, da.name, da.attrs)


def _timed(fn, warm: bool = True):
    """Run fn once for compile warm-up, once timed; returns (wall, result)."""
    with _silence:
        if warm:
            fn()
        t0 = time.perf_counter()
        out = fn()
        wall = time.perf_counter() - t0
    return wall, out


def config1_no_merge(da):
    import marex_tpu as marEx

    def run():
        ds = marEx.preprocess_data(
            da,
            method_anomaly="fixed_baseline",
            method_extreme="global_extreme",
            method_percentile="approximate",
            threshold_percentile=95,
            quiet=True,
        )
        ev, mask = ds.extreme_events, ds.mask
        del ds  # production runs detect/track as separate jobs (submit_track.sh)
        tr = marEx.tracker(
            ev, mask, R_fill=8, T_fill=2,
            area_filter_quartile=0.5, allow_merging=False, quiet=True,
        )
        return tr.run()

    return _timed(run)


def config2_hobday_shifting(n_years, ny, nx):
    """Production detect path (shifting_baseline + hobday). Runs on its own
    half-resolution block: the rolling climatology's (years, 366, space)
    intermediates are ~4x the input footprint, so the full-resolution block
    would not fit HBM alongside them on a 16 GB chip."""
    import marex_tpu as marEx

    da = _stage(make_data(n_years, ny, nx, seed=2))

    def run():
        ds = marEx.preprocess_data(
            da,
            method_anomaly="shifting_baseline",
            method_extreme="hobday_extreme",
            method_percentile="approximate",
            threshold_percentile=95,
            window_year_baseline=min(5, max(n_years - 1, 1)),
            smooth_days_baseline=21,
            window_days_hobday=11,
            quiet=True,
        )
        ev, mask = ds.extreme_events, ds.mask
        del ds  # production runs detect/track as separate jobs (submit_track.sh)
        tr = marEx.tracker(
            ev, mask, R_fill=8, T_fill=2,
            area_filter_quartile=0.5, allow_merging=False, quiet=True,
        )
        return tr.run()

    wall, out = _timed(run)
    return wall, out, da.sizes["time"] * ny * nx


def config3_regional(n_years, ny, nx):
    import marex_tpu as marEx

    da = _stage(make_data(n_years, ny, nx, seed=3, lat_range=(30.0, 70.0), lon_range=(-30.0, 40.0)))

    def run():
        ds = marEx.preprocess_data(
            da,
            method_anomaly="fixed_baseline",
            method_extreme="global_extreme",
            method_percentile="approximate",
            threshold_percentile=95,
            quiet=True,
        )
        ev, mask = ds.extreme_events, ds.mask
        del ds
        tr = marEx.regional_tracker(
            ev, mask, R_fill=8, T_fill=2,
            area_filter_absolute=50, allow_merging=False,
            coordinate_units="degrees", quiet=True,
        )
        return tr.run()

    wall, out = _timed(run)
    return wall, out, da.sizes["time"] * ny * nx


def config4_merge(da, ev_cache, mask_cache):
    import marex_tpu as marEx

    def run():
        tr = marEx.tracker(
            ev_cache, mask_cache, R_fill=8, T_fill=2,
            area_filter_quartile=0.5, allow_merging=True, nn_partitioning=True,
            overlap_threshold=0.25, quiet=True,
        )
        return tr.run()

    def run_full():
        ds = marEx.preprocess_data(
            da,
            method_anomaly="fixed_baseline",
            method_extreme="global_extreme",
            method_percentile="approximate",
            threshold_percentile=95,
            quiet=True,
        )
        ev, mask = ds.extreme_events, ds.mask
        del ds
        tr = marEx.tracker(
            ev, mask, R_fill=8, T_fill=2,
            area_filter_quartile=0.5, allow_merging=True, nn_partitioning=True,
            overlap_threshold=0.25, quiet=True,
        )
        return tr.run()

    with _silence:
        run()  # warm (track only — detect compiled by config 1)
        t0 = time.perf_counter()
        out = run_full()
        wall = time.perf_counter() - t0
    return wall, out


def config5_unstructured(n_years, n_cells):
    import marex_tpu as marEx

    da, nb, areas = make_unstructured(n_years, n_cells)
    da = _stage(da)
    dims = {"time": "time", "x": "ncells"}
    coords = {"time": "time", "x": "lon", "y": "lat"}

    def run():
        ds = marEx.preprocess_data(
            da,
            method_anomaly="fixed_baseline",
            method_extreme="global_extreme",
            method_percentile="approximate",
            threshold_percentile=95,
            dimensions=dims,
            coordinates=coords,
            neighbours=nb,
            cell_areas=areas,
            quiet=True,
        )
        ev, mask = ds.extreme_events, ds.mask
        nbv, cav = ds.neighbours, ds.cell_areas
        del ds
        tr = marEx.tracker(
            ev, mask, R_fill=2, T_fill=2,
            area_filter_quartile=0.5, allow_merging=False,
            unstructured_grid=True, dimensions={"x": "ncells"},
            coordinates={"x": "lon", "y": "lat"},
            coordinate_units="degrees", temp_dir="/tmp",
            neighbours=nbv, cell_areas=cav, quiet=True,
        )
        return tr.run()

    wall, out = _timed(run)
    return wall, out, da.sizes["time"] * da.sizes["ncells"]


def merge_dense_stress(ny: int, nx: int, T: int = 200, n_pairs: int = 24):
    """Merge-dense synthetic (VERDICT done-criterion: ~10% merging events
    without wall blowup): n_pairs blob pairs converge and merge mid-series.
    Returns (no_merge_wall, merge_wall, total_merges)."""
    import jax.numpy as jnp

    import marex_tpu as marEx
    from marex_tpu.core.field import Field

    data = np.zeros((T, ny, nx), bool)
    yy, xx = np.mgrid[0:ny, 0:nx]
    rng = np.random.default_rng(9)
    centers = [
        (rng.integers(ny // 6, 5 * ny // 6), rng.integers(0, nx))
        for _ in range(n_pairs)
    ]
    r = max(min(ny, nx) // 30, 5)
    for t in range(T):
        phase = (t % 50) / 50.0  # approach, merge, separate every 50 steps
        sep = int((1.0 - min(phase * 2, 1.0)) * 3 * r) + r
        for cy, cx0 in centers:
            for s in (-sep, sep):
                cx = (cx0 + s) % nx
                dx = np.minimum(np.abs(xx - cx), nx - np.abs(xx - cx))
                data[t] |= (yy - cy) ** 2 + dx**2 <= r * r
    coords = {
        "time": pd.date_range("2015-01-01", periods=T, freq="D").to_numpy(),
        "lat": np.linspace(-60, 60, ny),
        "lon": np.linspace(0, 360, nx, endpoint=False),
    }
    daf = Field(jnp.asarray(data), ("time", "lat", "lon"), coords=coords, name="extreme_events")
    mask = Field(np.ones((ny, nx), bool), ("lat", "lon"),
                 coords={"lat": coords["lat"], "lon": coords["lon"]}, name="mask")

    def run(merging):
        tr = marEx.tracker(
            daf, mask, R_fill=2, T_fill=0, area_filter_quartile=0.0,
            allow_merging=merging, nn_partitioning=True, overlap_threshold=0.3,
            quiet=True,
        )
        return tr.run()

    w_plain, _ = _timed(lambda: run(False))
    w_merge, ev = _timed(lambda: run(True))
    return w_plain, w_merge, int(ev.attrs["total_merges"])


def main() -> None:
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".benchmark_cache")
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    n_years = int(os.environ.get("MAREX_BENCH_YEARS", "3"))
    ny = int(os.environ.get("MAREX_BENCH_NY", "360"))
    nx = int(os.environ.get("MAREX_BENCH_NX", "720"))
    n_cells = int(os.environ.get("MAREX_BENCH_CELLS", "98304"))
    which = set(os.environ.get("MAREX_BENCH_CONFIGS", "1,2,3,4,5,6").split(","))

    da = _stage(make_data(n_years, ny, nx))
    T = da.sizes["time"]
    gpd = T * ny * nx

    detail = {"shape": [T, ny, nx], "configs": {}}

    headline_wall = None
    headline_events = None

    if "1" in which:
        wall, ev = config1_no_merge(da)
        detail["configs"]["1_fixed_global_nomerge"] = {
            "wall_s": round(wall, 2),
            "gpd_per_s": round(gpd / wall, 1),
            "n_events": int(ev.attrs["N_events_final"]),
        }

    if "2" in which:
        wall, ev, gpd2 = config2_hobday_shifting(max(n_years + 5, 8), max(ny // 2, 32), max(nx // 2, 64))
        detail["configs"]["2_shifting_hobday"] = {
            "wall_s": round(wall, 2),
            "gpd_per_s": round(gpd2 / wall, 1),
            "n_events": int(ev.attrs["N_events_final"]),
        }

    if "3" in which:
        reg_ny = max(ny // 2, 32)
        reg_nx = max(nx // 2, 64)
        wall, ev, reg_gpd = config3_regional(n_years, reg_ny, reg_nx)
        detail["configs"]["3_regional"] = {
            "wall_s": round(wall, 2),
            "gpd_per_s": round(reg_gpd / wall, 1),
            "n_events": int(ev.attrs["N_events_final"]),
        }

    if "4" in which:
        import marex_tpu as marEx

        with _silence:
            ds_cache = marEx.preprocess_data(
                da,
                method_anomaly="fixed_baseline",
                method_extreme="global_extreme",
                method_percentile="approximate",
                threshold_percentile=95,
                quiet=True,
            )
        ev_cache, mask_cache = ds_cache.extreme_events, ds_cache.mask
        del ds_cache  # keep only what tracking needs resident
        wall, ev = config4_merge(da, ev_cache, mask_cache)
        headline_wall = wall
        headline_events = int(ev.attrs["N_events_final"])
        detail["configs"]["4_merge_nn"] = {
            "wall_s": round(wall, 2),
            "gpd_per_s": round(gpd / wall, 1),
            "n_events": headline_events,
            "total_merges": int(ev.attrs["total_merges"]),
        }

    if "5" in which:
        wall, ev, cell_days = config5_unstructured(max(n_years // 2, 2), n_cells)
        detail["configs"]["5_unstructured"] = {
            "wall_s": round(wall, 2),
            "gpd_per_s": round(cell_days / wall, 1),
            "n_events": int(ev.attrs["N_events_final"]),
        }

    if "6" in which or "merge_dense" in which:
        w_plain, w_merge, n_merges = merge_dense_stress(max(ny // 2, 60), max(nx // 2, 120))
        detail["configs"]["6_merge_dense"] = {
            "no_merge_wall_s": round(w_plain, 2),
            "merge_wall_s": round(w_merge, 2),
            "merge_overhead_x": round(w_merge / max(w_plain, 1e-9), 2),
            "total_merges": n_merges,
        }

    if headline_wall is None:  # headline fallback when config 4 disabled
        with_tp = [c for c in detail["configs"].values() if "gpd_per_s" in c]
        if with_tp:
            throughput = with_tp[0]["gpd_per_s"]
            metric = "detect+track throughput (first enabled config)"
        else:  # e.g. merge-dense stress only
            c6 = detail["configs"].get("6_merge_dense", {})
            throughput = 1.0 / max(c6.get("merge_overhead_x", 1.0), 1e-9)
            metric = "merge-dense inverse overhead (no-merge wall / merge wall)"
    else:
        throughput = gpd / headline_wall
        metric = "detect+track throughput (fixed_baseline+global_extreme, allow_merging=True+nn, R_fill=8)"

    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(throughput, 1),
                "unit": "gridpoint-days/sec/chip",
                "vs_baseline": round(throughput / BASELINE_THROUGHPUT, 3),
                "detail": detail,
            }
        )
    )


if __name__ == "__main__":
    main()
