"""Full-pipeline multi-device execution tests (VERDICT round-1 item 1).

The public API (``preprocess_data``, ``tracker``) must run SPMD over a
device mesh and produce BIT-IDENTICAL results to the single-device run:
detect is pointwise over space (space sharding changes placement, not
math) and tracking is per-slice over time (time sharding likewise), so no
reduction reordering exists and exact equality is the contract — the
analogue of the reference's Dask chunking being semantics-free
(xr.apply_ufunc(dask="parallelized")).

Runs on the 8-virtual-CPU-device mesh configured in conftest.
"""

import numpy as np
import pandas as pd
import pytest

import jax

import marex_tpu as marEx
from marex_tpu.core.field import Field
from marex_tpu.parallel import make_mesh, use_mesh

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


def _blob_sst(T=64, H=16, W=32, seed=0):
    rng = np.random.default_rng(seed)
    sst = 15.0 + 0.5 * rng.standard_normal((T, H, W)).astype(np.float32)
    yy, xx = np.mgrid[0:H, 0:W]
    for t in range(T // 3, 2 * T // 3):
        cx = (4 + t) % W
        dx = np.minimum(np.abs(xx - cx), W - np.abs(xx - cx))
        blob = (yy - H // 2) ** 2 + dx**2 <= 4**2
        sst[t][blob] += 5.0
    coords = {
        "time": pd.date_range("2000-01-01", periods=T, freq="D").to_numpy(),
        "lat": np.linspace(-40, 40, H),
        "lon": np.linspace(0, 360, W, endpoint=False),
    }
    return Field(sst, ("time", "lat", "lon"), coords, name="sst")


def _preprocess(da, mesh=None):
    return marEx.preprocess_data(
        da,
        method_anomaly="detrend_harmonic",
        method_extreme="global_extreme",
        threshold_percentile=95,
        quiet=True,
        mesh=mesh,
    )


class TestMeshPipeline:
    def test_detect_mesh_equals_single_device(self):
        da = _blob_sst()
        mesh = make_mesh()
        ds_single = _preprocess(da)
        ds_mesh = _preprocess(da, mesh=mesh)
        # space sharding must not change a single bit
        assert np.array_equal(
            np.asarray(ds_single["extreme_events"].values), np.asarray(ds_mesh["extreme_events"].values)
        )
        assert np.array_equal(
            np.asarray(ds_single["dat_anomaly"].values), np.asarray(ds_mesh["dat_anomaly"].values)
        )
        assert np.array_equal(
            np.asarray(ds_single["thresholds"].values), np.asarray(ds_mesh["thresholds"].values)
        )
        # the sharded arrays really live on the mesh
        shards = {d.device for d in ds_mesh["dat_anomaly"].data.addressable_shards}
        assert len(shards) == len(jax.devices())

    def test_track_mesh_equals_single_device(self):
        da = _blob_sst()
        mesh = make_mesh()
        ds = _preprocess(da)

        def run(mesh_arg):
            tr = marEx.tracker(
                ds["extreme_events"],
                ds["mask"],
                R_fill=2,
                T_fill=2,
                area_filter_quartile=0.5,
                allow_merging=True,
                overlap_threshold=0.25,
                quiet=True,
                mesh=mesh_arg,
            )
            return tr.run()

        ev_single = run(None)
        ev_mesh = run(mesh)
        assert np.array_equal(np.asarray(ev_single["ID_field"].values), np.asarray(ev_mesh["ID_field"].values))
        assert ev_single.attrs["N_events_final"] == ev_mesh.attrs["N_events_final"]
        assert ev_single.attrs["total_merges"] == ev_mesh.attrs["total_merges"]
        assert np.array_equal(np.asarray(ev_single["global_ID"].values), np.asarray(ev_mesh["global_ID"].values))
        assert np.array_equal(
            np.asarray(ev_single["area"].values), np.asarray(ev_mesh["area"].values), equal_nan=True
        )
        assert ev_mesh.attrs["N_events_final"] > 0

    def test_detect_mesh_shifting_hobday_equals_single_device(self):
        # the PRODUCTION detect path (shifting_baseline + hobday_extreme,
        # detect.py:1858-2023) under a mesh — VERDICT r2 item 4a
        T = 3 * 365
        rng = np.random.default_rng(5)
        doy = pd.DatetimeIndex(pd.date_range("2000-01-01", periods=T, freq="D")).dayofyear.to_numpy()
        sst = (
            15.0
            + 2.0 * np.cos(2 * np.pi * (doy[:, None, None] - 30) / 365.25)
            + 0.5 * rng.standard_normal((T, 8, 16))
        ).astype(np.float32)
        da = Field(
            sst,
            ("time", "lat", "lon"),
            {
                "time": pd.date_range("2000-01-01", periods=T, freq="D").to_numpy(),
                "lat": np.linspace(-30, 30, 8),
                "lon": np.linspace(0, 360, 16, endpoint=False),
            },
            name="sst",
        )

        def run(mesh_arg):
            return marEx.preprocess_data(
                da,
                method_anomaly="shifting_baseline",
                method_extreme="hobday_extreme",
                window_year_baseline=2,
                smooth_days_baseline=5,
                window_days_hobday=11,
                threshold_percentile=90,
                quiet=True,
                mesh=mesh_arg,
            )

        ds_single = run(None)
        ds_mesh = run(make_mesh())
        for v in ("dat_anomaly", "extreme_events", "thresholds", "mask"):
            a = np.asarray(ds_single[v].values)
            b = np.asarray(ds_mesh[v].values)
            assert np.array_equal(a, b, equal_nan=a.dtype.kind == "f"), v
        assert int(np.asarray(ds_mesh["extreme_events"].values).sum()) > 0

    def test_track_mesh_merging_nonzero(self):
        # sharded split/merge with REAL merges — VERDICT r2 item 4b: a mesh
        # run whose total_merges > 0 and equals the single-device run
        T, H, W = 24, 24, 48
        data = np.zeros((T, H, W), bool)
        yy, xx = np.mgrid[0:H, 0:W]
        for t in range(T):
            cxa = 8 + t
            cxb = 40 - t
            a = (yy - 12) ** 2 + (xx - cxa) ** 2 <= 9
            b = (yy - 12) ** 2 + (xx - cxb) ** 2 <= 9
            data[t] = a | b
        coords = {
            "time": pd.date_range("2010-01-01", periods=T, freq="D").to_numpy(),
            "lat": np.linspace(-40, 40, H),
            "lon": np.linspace(0, 360, W, endpoint=False),
        }
        daf = Field(data, ("time", "lat", "lon"), coords, name="extreme_events")
        mask = Field(np.ones((H, W), bool), ("lat", "lon"), {"lat": coords["lat"], "lon": coords["lon"]}, name="mask")

        def run(mesh_arg):
            tr = marEx.tracker(
                daf,
                mask,
                R_fill=2,
                T_fill=0,
                area_filter_quartile=0.0,
                allow_merging=True,
                nn_partitioning=True,
                overlap_threshold=0.3,
                quiet=True,
                mesh=mesh_arg,
            )
            return tr.run(return_merges=True)

        ev_s, mg_s = run(None)
        ev_m, mg_m = run(make_mesh())
        assert ev_s.attrs["total_merges"] == ev_m.attrs["total_merges"] > 0
        assert ev_s.attrs["N_events_final"] == ev_m.attrs["N_events_final"]
        assert np.array_equal(np.asarray(ev_s["ID_field"].values), np.asarray(ev_m["ID_field"].values))
        assert np.array_equal(np.asarray(mg_s["parent_IDs"].values), np.asarray(mg_m["parent_IDs"].values))

    def test_unstructured_mesh_pipeline(self):
        # unstructured detect+track under a mesh vs single-device
        from .conftest import make_unstructured_sst

        uda, nb, ca = make_unstructured_sst(n_years=2, n_side=12)
        kw = dict(
            method_anomaly="fixed_baseline",
            method_extreme="global_extreme",
            threshold_percentile=92,
            dimensions={"time": "time", "x": "ncells"},
            coordinates={"time": "time", "x": "lon", "y": "lat"},
            quiet=True,
        )

        def run(mesh_arg):
            ds = marEx.preprocess_data(uda, neighbours=nb, cell_areas=ca, mesh=mesh_arg, **kw)
            tr = marEx.tracker(
                ds["extreme_events"],
                ds["mask"],
                R_fill=1,
                T_fill=2,
                area_filter_absolute=5,
                allow_merging=True,
                overlap_threshold=0.5,
                unstructured_grid=True,
                dimensions={"x": "ncells"},
                coordinates={"x": "lon", "y": "lat"},
                coordinate_units="degrees",
                temp_dir="/tmp",
                neighbours=ds["neighbours"],
                cell_areas=ds["cell_areas"],
                quiet=True,
                mesh=mesh_arg,
            )
            return tr.run()

        ev_s = run(None)
        ev_m = run(make_mesh())
        assert ev_s.attrs["N_events_final"] == ev_m.attrs["N_events_final"] > 0
        assert ev_s.attrs["total_merges"] == ev_m.attrs["total_merges"]
        assert np.array_equal(np.asarray(ev_s["ID_field"].values), np.asarray(ev_m["ID_field"].values))

    def test_use_mesh_context_scopes_pipeline(self):
        da = _blob_sst(T=32)
        ds_single = _preprocess(da)
        with use_mesh(make_mesh()):
            ds_ctx = _preprocess(da)
        assert np.array_equal(
            np.asarray(ds_single["extreme_events"].values), np.asarray(ds_ctx["extreme_events"].values)
        )

    def test_mesh_true_builds_auto_mesh(self):
        da = _blob_sst(T=32)
        ds = _preprocess(da, mesh=True)
        tr = marEx.tracker(
            ds["extreme_events"],
            ds["mask"],
            R_fill=2,
            T_fill=0,
            area_filter_quartile=0.5,
            allow_merging=False,
            quiet=True,
            mesh=True,
        )
        ev = tr.run()
        assert ev.attrs["N_events_final"] > 0
