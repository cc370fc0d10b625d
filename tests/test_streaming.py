"""Streamed larger-than-memory ingest & detect.

Covers the round-3 scale-truth contract: lazy chunk-level zarr reads
(io.zarr_lite.LazyZarrArray), chunk-aligned region writes, bit-exact
equality of the streamed detect path with the monolithic path for every
method combination (the hobday spatial window crossing tile seams), and a
subprocess peak-RSS bound while processing a dataset 4x larger than the
configured tile budget (the reference's defining capability,
/root/reference/README.md:161, docs/why_marex.rst:153).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import pandas as pd

import marex_tpu as marEx
from marex_tpu.core.field import Field
from marex_tpu.io import zarr_lite as zl

from .conftest import make_gridded_sst, make_unstructured_sst


@pytest.fixture(scope="module")
def small_store(tmp_path_factory):
    da = make_gridded_sst(n_years=4, ny=20, nx=40)
    p = str(tmp_path_factory.mktemp("stream") / "sst.zarr")
    zl.to_zarr(da, p, chunks={"time": 500, "lat": 8})
    return p, da


class TestLazyZarr:
    def test_lazy_slices_match_eager(self, small_store):
        p, da = small_store
        fs = zl.open_zarr(p, chunks={"time": 500})
        h = fs.data_vars["sst"].data
        assert type(h).__name__ == "LazyZarrArray"
        full = np.asarray(da.values)
        assert np.array_equal(h[3:20, 5:13, :], full[3:20, 5:13, :], equal_nan=True)
        assert np.array_equal(h[7], full[7], equal_nan=True)
        assert np.array_equal(h[:, -5:, 2], full[:, -5:, 2], equal_nan=True)
        assert np.array_equal(np.asarray(h), full, equal_nan=True)
        # eager open still equal
        assert np.array_equal(zl.open_zarr(p).data_vars["sst"].values, full, equal_nan=True)

    def test_lazy_rejects_fancy_indexing(self, small_store):
        p, _ = small_store
        h = zl.open_zarr(p, lazy=True).data_vars["sst"].data
        with pytest.raises(IndexError):
            h[[0, 2, 4]]
        with pytest.raises(IndexError):
            h[::2]

    def test_lazy_blosc_reference_fixture(self):
        ref = "/root/reference/tests/data/extremes_gridded.zarr"
        if not os.path.isdir(ref):
            pytest.skip("reference fixtures not available")
        lazy = zl.open_zarr(ref, lazy=True).data_vars["extreme_events"].data
        full = zl.open_zarr(ref).data_vars["extreme_events"].values
        assert np.array_equal(lazy[5:9, 40:100, :], full[5:9, 40:100, :])

    def test_region_writes_roundtrip(self, tmp_path):
        q = str(tmp_path / "region.zarr")
        rng = np.random.default_rng(1)
        arr = rng.standard_normal((50, 24, 36)).astype(np.float32)
        zl.create_group(q, {"a": 1})
        zl.create_array(q, "out", (50, 24, 36), np.float32, ("t", "y", "x"), (20, 8, 36))
        for r0 in range(0, 24, 8):
            zl.write_region(q, "out", (0, r0, 0), arr[:, r0 : r0 + 8, :])
        back = zl.open_zarr(q)
        assert np.array_equal(back.data_vars["out"].values, arr)
        assert back.attrs["a"] == 1

    def test_region_write_alignment_enforced(self, tmp_path):
        q = str(tmp_path / "align.zarr")
        zl.create_group(q)
        zl.create_array(q, "out", (10, 10), np.float32, ("y", "x"), (4, 10))
        with pytest.raises(marEx.DataValidationError):
            zl.write_region(q, "out", (3, 0), np.zeros((4, 10), np.float32))
        # mid-chunk END not at the array edge must also fail
        with pytest.raises(marEx.DataValidationError):
            zl.write_region(q, "out", (0, 0), np.zeros((3, 10), np.float32))
        # edge block (shorter than a chunk at the array edge) is fine
        zl.write_region(q, "out", (8, 0), np.ones((2, 10), np.float32))

    def test_raw_compressor_and_bool(self, tmp_path):
        q = str(tmp_path / "raw.zarr")
        zl.create_group(q)
        flags = np.random.default_rng(2).standard_normal((30, 14)) > 0
        zl.create_array(q, "flags", (30, 14), bool, ("t", "c"), (30, 7), compressor=None)
        for c0 in range(0, 14, 7):
            zl.write_region(q, "flags", (0, c0), flags[:, c0 : c0 + 7])
        assert np.array_equal(zl.open_zarr(q).data_vars["flags"].values, flags)


class TestStreamedDetectEquality:
    @pytest.mark.parametrize(
        "meth_a,meth_e,pct",
        [
            ("fixed_baseline", "global_extreme", "approximate"),
            ("fixed_baseline", "global_extreme", "exact"),
            ("detrend_harmonic", "hobday_extreme", "approximate"),
            ("fixed_baseline", "hobday_extreme", "exact"),
            ("detrend_fixed_baseline", "global_extreme", "approximate"),
        ],
    )
    def test_streamed_matches_monolithic(self, tmp_path, meth_a, meth_e, pct):
        da = make_gridded_sst(n_years=4, ny=20, nx=40)
        kw = dict(method_anomaly=meth_a, method_extreme=meth_e, method_percentile=pct)
        ds_m = marEx.preprocess_data(da, quiet=True, **kw)
        ds_s = marEx.preprocess_data_streamed(da, str(tmp_path / "out.zarr"), row_block=7, **kw)
        # climatology methods are bit-exact; detrend lstsq matmuls tile
        # differently at tile width, so those match to float32 round-off
        exact = not meth_a.startswith("detrend")
        for v in ("dat_anomaly", "extreme_events", "thresholds", "mask"):
            a = np.asarray(ds_m[v].values)
            b = np.asarray(ds_s.data_vars[v].values)
            assert a.shape == b.shape, v
            if exact or a.dtype.kind != "f":
                if a.dtype.kind == "b" and not exact:
                    assert (a != b).mean() < 1e-4, f"{v} differs ({meth_a}/{meth_e}/{pct})"
                else:
                    assert np.array_equal(a, b, equal_nan=a.dtype.kind == "f"), f"{v} differs ({meth_a}/{meth_e}/{pct})"
            else:
                assert np.allclose(a, b, rtol=0, atol=1e-4, equal_nan=True), f"{v} differs ({meth_a}/{meth_e}/{pct})"
        assert ds_s.attrs["method_anomaly"] == meth_a
        assert ds_s.attrs["streamed"] == 1

    def test_streamed_shifting_baseline_from_lazy_store(self, tmp_path):
        da = make_gridded_sst(n_years=17, ny=12, nx=24)
        src = str(tmp_path / "in.zarr")
        zl.to_zarr(da, src, chunks={"time": 800, "lat": 4})
        kw = dict(method_anomaly="shifting_baseline", method_extreme="hobday_extreme")
        ds_m = marEx.preprocess_data(da, quiet=True, **kw)
        ds_s = marEx.preprocess_data_streamed(src, str(tmp_path / "out.zarr"), row_block=5, **kw)
        for v in ("dat_anomaly", "extreme_events", "thresholds", "mask"):
            a = np.asarray(ds_m[v].values)
            b = np.asarray(ds_s.data_vars[v].values)
            assert np.array_equal(a, b, equal_nan=a.dtype.kind == "f"), v
        # time axis trimmed identically (first 15 baseline years dropped)
        assert np.array_equal(np.asarray(ds_m.coords["time"].values), ds_s.coords["time"].values)

    def test_streamed_unstructured(self, tmp_path):
        uda, nb, ca = make_unstructured_sst(n_years=3, n_side=12)
        kw = dict(
            method_anomaly="fixed_baseline",
            method_extreme="hobday_extreme",
            dimensions={"time": "time", "x": "ncells"},
            coordinates={"time": "time", "x": "lon", "y": "lat"},
        )
        ds_m = marEx.preprocess_data(uda, neighbours=nb, cell_areas=ca, quiet=True, **kw)
        ds_s = marEx.preprocess_data_streamed(
            uda, str(tmp_path / "out.zarr"), row_block=57, neighbours=nb, cell_areas=ca, **kw
        )
        for v in ("dat_anomaly", "extreme_events", "thresholds", "mask"):
            a = np.asarray(ds_m[v].values)
            b = np.asarray(ds_s.data_vars[v].values)
            assert np.array_equal(a, b, equal_nan=a.dtype.kind == "f"), v
        assert "neighbours" in ds_s.data_vars and "cell_areas" in ds_s.data_vars

    def test_streamed_std_normalise(self, tmp_path):
        # detrend lstsq matmuls tile differently at tile width vs full width,
        # so equality is to float32 round-off here (see module docstring)
        da = make_gridded_sst(n_years=4, ny=12, nx=24)
        kw = dict(method_anomaly="detrend_harmonic", method_extreme="global_extreme", std_normalise=True)
        ds_m = marEx.preprocess_data(da, quiet=True, **kw)
        ds_s = marEx.preprocess_data_streamed(da, str(tmp_path / "out.zarr"), row_block=5, **kw)
        for v in ("dat_anomaly", "dat_stn", "STD", "thresholds_stn"):
            a = np.asarray(ds_m[v].values)
            b = np.asarray(ds_s.data_vars[v].values)
            assert np.allclose(a, b, rtol=0, atol=1e-4, equal_nan=True), v
        a = np.asarray(ds_m["extreme_events_stn"].values)
        b = np.asarray(ds_s.data_vars["extreme_events_stn"].values)
        assert (a != b).mean() < 1e-4  # borderline threshold flips only

    def test_streamed_all_land_tile(self, tmp_path):
        # rows 0-7 fully NaN: the all-land fast path must write fills that
        # match the monolithic result
        da = make_gridded_sst(n_years=4, ny=20, nx=40, with_land=False)
        vals = np.asarray(da.values).copy()
        vals[:, 0:8, :] = np.nan
        da = marEx.Field(vals, da.dims, da.coords, name="sst")
        kw = dict(method_anomaly="fixed_baseline", method_extreme="global_extreme")
        ds_m = marEx.preprocess_data(da, quiet=True, **kw)
        ds_s = marEx.preprocess_data_streamed(da, str(tmp_path / "out.zarr"), row_block=4, **kw)
        for v in ("dat_anomaly", "extreme_events", "thresholds", "mask"):
            a = np.asarray(ds_m[v].values)
            b = np.asarray(ds_s.data_vars[v].values)
            assert np.array_equal(a, b, equal_nan=a.dtype.kind == "f"), v

    def test_streamed_requires_time_major(self, tmp_path):
        da = make_gridded_sst(n_years=2, ny=8, nx=12).transpose("lat", "time", "lon")
        with pytest.raises(marEx.DataValidationError):
            marEx.preprocess_data_streamed(da, str(tmp_path / "out.zarr"))


RSS_SCRIPT = r"""
import json, os, resource, sys
# NB: the JAX_PLATFORMS env var is ignored by this jax build; only the
# config update selects the backend reliably
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

# ru_maxrss is USELESS here: posix_spawn (clone+CLONE_VM) makes the child
# inherit the fat pytest parent's RSS high-water mark. Reset the kernel
# hiwater and read VmHWM instead.
with open("/proc/self/clear_refs", "w") as fh:
    fh.write("5")

def maxrss():
    with open("/proc/self/status") as fh:
        for ln in fh:
            if ln.startswith("VmHWM"):
                return int(ln.split()[1]) * 1024
    return 0

trace = {"import_jax": maxrss()}

store, out = sys.argv[1], sys.argv[2]
T, NY, NX = 3654, 192, 144
DATASET_BYTES = T * NY * NX * 4

# 1. write the input store INCREMENTALLY (never holding the full array)
from marex_tpu.io import zarr_lite as zl
import pandas as pd
zl.create_group(store)
zl.create_array(store, "sst", (T, NY, NX), np.float32, ("time", "lat", "lon"), (256, 8, NX), compressor=None)
rng = np.random.default_rng(0)
doy_all = pd.DatetimeIndex(pd.date_range("2000-01-01", periods=T, freq="D")).dayofyear.to_numpy()
for t0 in range(0, T, 256):
    tt = np.arange(t0, min(t0 + 256, T))
    block = (
        15.0
        + 3.0 * np.cos(2 * np.pi * (doy_all[tt, None, None] - 30) / 365.25)
        + rng.standard_normal((len(tt), NY, NX))
    ).astype(np.float32)
    zl.write_region(store, "sst", (t0, 0, 0), block)
    del block
zl._write_array(store, "time", pd.date_range("2000-01-01", periods=T, freq="D").to_numpy(), ("time",), {})
zl._write_array(store, "lat", np.linspace(-60, 60, NY), ("lat",), {})
zl._write_array(store, "lon", np.linspace(0, 360, NX, endpoint=False), ("lon",), {})
trace["store_written"] = maxrss()

# 2. init jax, snapshot baseline RSS
import jax, jax.numpy as jnp
jnp.zeros(8).block_until_ready()
trace["jax_init"] = maxrss()
import marex_tpu as marEx
trace["marex_import"] = maxrss()

def rss():
    with open("/proc/self/status") as fh:
        for ln in fh:
            if ln.startswith("VmRSS"):
                return int(ln.split()[1]) * 1024
    return 0

base = rss()
peak_after_write = maxrss()

# 3. streamed detect with a ~10x-smaller tile working set (3 rows/tile)
ds = marEx.preprocess_data_streamed(
    store, out,
    method_anomaly="fixed_baseline", method_extreme="global_extreme",
    row_block=3,
    compressor=None,
)
peak_after_stream = maxrss()
n_ex = int(np.asarray(ds.data_vars["extreme_events"].data[:64]).sum())
peak = maxrss()
print(json.dumps({
    "base": base, "peak": peak, "dataset": DATASET_BYTES, "n_ex_probe": n_ex,
    "peak_after_write": peak_after_write, "peak_after_stream": peak_after_stream,
    "trace": trace,
}))
"""


@pytest.mark.slow
class TestBoundedMemory:
    def test_peak_rss_bounded(self, tmp_path):
        """Process a dataset 4x larger than the tile budget; peak RSS growth
        over the post-import baseline must stay well under the dataset size."""
        script = tmp_path / "rss_probe.py"
        script.write_text(RSS_SCRIPT)
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # single device is fine; avoid 8x buffers
        repo_root = os.path.dirname(os.path.dirname(__file__))
        env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
        r = subprocess.run(
            [sys.executable, str(script), str(tmp_path / "in.zarr"), str(tmp_path / "out.zarr")],
            capture_output=True,
            text=True,
            timeout=1200,
            env=env,
            cwd=os.path.dirname(os.path.dirname(__file__)),
        )
        assert r.returncode == 0, r.stderr[-3000:]
        stats = json.loads(r.stdout.strip().splitlines()[-1])
        growth = stats["peak"] - stats["base"]
        # dataset ~404 MB; tile working set ~38 MB (10x smaller). Fixed JAX
        # overhead (thread pools, compile arenas) is ~130 MB regardless of
        # data size, so allow 0.5x dataset + 80 MB. A monolithic run would
        # grow by >= 2x the dataset (payload + device staging + ymd scatter).
        assert growth < 0.5 * stats["dataset"] + 80 * 2**20, (
            f"peak RSS grew {growth/2**20:.0f} MB over baseline (dataset {stats['dataset']/2**20:.0f} MB); "
            f"checkpoints MB: base={stats['base']/2**20:.0f} after_write={stats['peak_after_write']/2**20:.0f} "
            f"after_stream={stats['peak_after_stream']/2**20:.0f} final={stats['peak']/2**20:.0f} "
            f"trace={ {k: round(v/2**20) for k, v in stats['trace'].items()} }"
        )
        assert stats["n_ex_probe"] > 0


class TestStreamedTracking:
    """Larger-than-memory tracking: the streamed pipeline (lazy zarr input,
    blockwise march, region-written ID_field) must be bit-identical to the
    in-memory tracker on merge-dense data."""

    @staticmethod
    def _field(T=50, NY=48, NX=180, n_pairs=4, seed=7):
        data = np.zeros((T, NY, NX), bool)
        yy, xx = np.mgrid[0:NY, 0:NX]
        rng = np.random.default_rng(seed)
        centers = [(int(rng.integers(NY // 5, 4 * NY // 5)), int(rng.integers(0, NX))) for _ in range(n_pairs)]
        r = 5
        for t in range(T):
            phase = (t % 20) / 20.0
            sep = int((1.0 - min(phase * 2, 1.0)) * 3 * r) + r
            for cy, cx0 in centers:
                for s in (-sep, sep):
                    cx = (cx0 + s) % NX
                    dx = np.minimum(np.abs(xx - cx), NX - np.abs(xx - cx))
                    data[t] |= (yy - cy) ** 2 + dx**2 <= r * r
        coords = {
            "time": pd.date_range("2021-01-01", periods=T, freq="D").to_numpy(),
            "lat": np.linspace(-40, 40, NY),
            "lon": np.linspace(0, 360, NX, endpoint=False),
        }
        da = Field(data, ("time", "lat", "lon"), coords=coords, name="extreme_events")
        mask = Field(np.ones((NY, NX), bool), ("lat", "lon"),
                     coords={"lat": coords["lat"], "lon": coords["lon"]}, name="mask")
        return da, mask

    def test_streamed_equals_in_memory(self, tmp_path):
        from marex_tpu import track as _trackmod
        from marex_tpu.io import zarr_lite

        da, mask = self._field()
        kw = dict(R_fill=2, T_fill=2, area_filter_quartile=0.5, allow_merging=True,
                  nn_partitioning=True, overlap_threshold=0.3, quiet=True)

        _trackmod._SCAN_SIZE_CACHE.clear()
        ev_mem, mg_mem = marEx.tracker(da, mask, **kw).run(return_merges=True)

        # streamed: lazy zarr input, small blocks
        src = str(tmp_path / "extremes.zarr")
        zarr_lite.to_zarr(da, src, chunks={"time": 10})
        lazy = zarr_lite.open_zarr(src, lazy=True)
        tr = marEx.tracker(lazy["extreme_events"], mask, **kw)
        ev_st, mg_st = tr.run_streamed(
            str(tmp_path / "events.zarr"), block_T=13, return_merges=True
        )
        assert tr.dispatch_counts["march_scan"] >= 4  # really ran blockwise

        np.testing.assert_array_equal(np.asarray(ev_st.ID_field.values), ev_mem.ID_field.values)
        assert ev_st.attrs["N_events_final"] == ev_mem.attrs["N_events_final"]
        assert ev_st.attrs["total_merges"] == ev_mem.attrs["total_merges"]
        assert ev_st.attrs["total_merges"] > 0
        for name in ("presence", "area", "centroid", "global_ID", "merge_ledger"):
            np.testing.assert_allclose(
                np.nan_to_num(np.asarray(ev_st[name].values, np.float64), nan=-999.0),
                np.nan_to_num(np.asarray(ev_mem[name].values, np.float64), nan=-999.0),
                rtol=1e-5, atol=1e-5,
            )
        for name in ("parent_IDs", "child_IDs", "merge_time", "n_parents"):
            np.testing.assert_array_equal(mg_st[name].values, mg_mem[name].values)
        # key preprocessing statistics survive the streamed path
        for key in ("N_objects_prefiltered", "N_objects_filtered", "allow_merging"):
            assert ev_st.attrs[key] == ev_mem.attrs[key]

    def test_streamed_rejects_no_merge(self, tmp_path):
        da, mask = self._field(T=12)
        tr = marEx.tracker(da, mask, R_fill=1, T_fill=0, area_filter_quartile=0.0,
                           allow_merging=False, quiet=True)
        with pytest.raises(marEx.ConfigurationError, match="allow_merging"):
            tr.run_streamed(str(tmp_path / "x.zarr"))

    def test_streamed_unstructured_equals_in_memory(self, tmp_path):
        """The streamed pipeline on a triangular mesh (BFS march blocks,
        spherical additive components, cell-area weights) matches the
        in-memory tracker exactly."""
        from .conftest import make_unstructured_mesh
        from marex_tpu import track as _trackmod
        from marex_tpu.core.field import Coord
        from marex_tpu.io import zarr_lite

        lat_c, lon_c, nb, areas = make_unstructured_mesh(n_side=28, seed=5)
        C = len(lat_c)
        T = 40
        data = np.zeros((T, C), bool)
        for t in range(T):
            phase = (t % 20) / 20.0
            sep = (1.0 - min(phase * 2, 1.0)) * 24 + 8
            for band, lonc0 in ((20, 80), (-20, 250)):
                for s in (-sep, sep):
                    d = np.abs(lon_c - (lonc0 + s))
                    data[t] |= (np.abs(lat_c - band) < 14) & (d < 16)
        coords = {"time": pd.date_range("2019-01-01", periods=T, freq="D").to_numpy(),
                  "lat": Coord("ncells", lat_c), "lon": Coord("ncells", lon_c)}
        da = Field(data, ("time", "ncells"), coords=coords, name="extreme_events")
        mask = Field(np.ones(C, bool), ("ncells",),
                     coords={"lat": Coord("ncells", lat_c), "lon": Coord("ncells", lon_c)}, name="mask")
        nbf = Field(nb, ("nv", "ncells"), name="neighbours")
        caf = Field(areas, ("ncells",), name="cell_areas")
        kw = dict(R_fill=1, T_fill=2, area_filter_absolute=1, allow_merging=True,
                  nn_partitioning=True, overlap_threshold=0.3, unstructured_grid=True,
                  dimensions={"x": "ncells"}, coordinates={"x": "lon", "y": "lat"},
                  coordinate_units="degrees", neighbours=nbf, cell_areas=caf, quiet=True)

        _trackmod._SCAN_SIZE_CACHE.clear()
        ev_mem = marEx.tracker(da, mask, temp_dir=str(tmp_path / "m"), **kw).run()

        src = str(tmp_path / "ev_unstr.zarr")
        zarr_lite.to_zarr(da, src, chunks={"time": 10})
        lazy = zarr_lite.open_zarr(src, lazy=True)
        tr = marEx.tracker(lazy["extreme_events"], mask, temp_dir=str(tmp_path / "s"), **kw)
        ev_st = tr.run_streamed(str(tmp_path / "events_u.zarr"), block_T=13)
        assert tr.dispatch_counts["march_scan"] >= 4
        assert ev_st.attrs["total_merges"] == ev_mem.attrs["total_merges"] > 0
        np.testing.assert_array_equal(np.asarray(ev_st.ID_field.values), ev_mem.ID_field.values)
        for name in ("presence", "area", "centroid"):
            np.testing.assert_allclose(
                np.nan_to_num(np.asarray(ev_st[name].values, np.float64), nan=-999.0),
                np.nan_to_num(np.asarray(ev_mem[name].values, np.float64), nan=-999.0),
                rtol=1e-5, atol=1e-5,
            )
