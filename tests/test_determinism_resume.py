"""Determinism and checkpoint/resume guarantees (VERDICT round-1 item 7).

The reference approaches determinism operationally (work-stealing disabled,
zarr-roundtrip graph refreshes, SURVEY §5); marex_tpu is SPMD-deterministic
by construction — these tests pin that as a contract: two identical tracker
runs produce identical ID fields/ledgers, and a run resumed from a stage
checkpoint ('save' then 'load') reproduces the direct run exactly
(reference checkpoint semantics: track.py:1253-1366).
"""

import numpy as np
import pandas as pd

import marex_tpu as marEx
from marex_tpu.core.field import Field

NY, NX = 40, 120


def merging_blobs(T=20):
    data = np.zeros((T, NY, NX), bool)
    yy, xx = np.mgrid[0:NY, 0:NX]
    for t in range(T):
        a = (yy - 20) ** 2 + (xx - (30 + 2 * t)) ** 2 <= 49
        b = (yy - 20) ** 2 + (xx - (90 - 2 * t)) ** 2 <= 49
        data[t] = a | b
    coords = {
        "time": pd.date_range("2021-01-01", periods=T, freq="D").to_numpy(),
        "lat": np.linspace(-30, 30, NY),
        "lon": np.linspace(0, 360, NX, endpoint=False),
    }
    return Field(data, ("time", "lat", "lon"), coords=coords, name="extreme_events")


def ocean_mask():
    return Field(
        np.ones((NY, NX), bool),
        ("lat", "lon"),
        coords={"lat": np.linspace(-30, 30, NY), "lon": np.linspace(0, 360, NX, endpoint=False)},
        name="mask",
    )


def _run(da, **kw):
    tr = marEx.tracker(
        da,
        ocean_mask(),
        R_fill=2,
        T_fill=2,
        area_filter_quartile=0.0,
        allow_merging=True,
        nn_partitioning=True,
        overlap_threshold=0.3,
        quiet=True,
        **kw,
    )
    return tr.run(return_merges=True)


class TestDeterminism:
    def test_identical_runs_identical_outputs(self):
        da = merging_blobs()
        ev1, mg1 = _run(da)
        ev2, mg2 = _run(da)
        assert np.array_equal(np.asarray(ev1.ID_field.values), np.asarray(ev2.ID_field.values))
        assert np.array_equal(np.asarray(ev1.global_ID.values), np.asarray(ev2.global_ID.values))
        assert np.array_equal(np.asarray(ev1.merge_ledger.values), np.asarray(ev2.merge_ledger.values))
        assert ev1.attrs["N_events_final"] == ev2.attrs["N_events_final"]
        assert ev1.attrs["total_merges"] == ev2.attrs["total_merges"]
        assert np.array_equal(np.asarray(mg1.parent_IDs.values), np.asarray(mg2.parent_IDs.values))
        assert np.array_equal(np.asarray(mg1.merge_time.values), np.asarray(mg2.merge_time.values))

    def test_detect_deterministic(self):
        rng = np.random.default_rng(5)
        T, H, W = 365, 12, 24
        sst = 15 + rng.standard_normal((T, H, W)).astype(np.float32)
        coords = {
            "time": pd.date_range("2001-01-01", periods=T, freq="D").to_numpy(),
            "lat": np.linspace(-30, 30, H),
            "lon": np.linspace(0, 360, W, endpoint=False),
        }
        da = Field(sst, ("time", "lat", "lon"), coords=coords, name="sst")
        ds1 = marEx.preprocess_data(da, method_anomaly="detrend_harmonic", method_extreme="global_extreme", quiet=True)
        ds2 = marEx.preprocess_data(da, method_anomaly="detrend_harmonic", method_extreme="global_extreme", quiet=True)
        assert np.array_equal(np.asarray(ds1.dat_anomaly.values), np.asarray(ds2.dat_anomaly.values))
        assert np.array_equal(np.asarray(ds1.extreme_events.values), np.asarray(ds2.extreme_events.values))


class TestCheckpointResume:
    def test_resume_reproduces_direct_run(self, tmp_path):
        da = merging_blobs()
        # direct run
        ev_direct, _ = _run(da)
        # checkpointed run: save preprocess, then resume from disk
        _run(da, temp_dir=str(tmp_path), checkpoint="save")
        ev_resumed, _ = _run(da, temp_dir=str(tmp_path), checkpoint="load")
        assert np.array_equal(np.asarray(ev_direct.ID_field.values), np.asarray(ev_resumed.ID_field.values))
        assert ev_direct.attrs["N_events_final"] == ev_resumed.attrs["N_events_final"]
        assert ev_direct.attrs["total_merges"] == ev_resumed.attrs["total_merges"]
        for key in ("N_objects_prefiltered", "N_objects_filtered", "preprocessed_area_fraction"):
            assert ev_direct.attrs[key] == ev_resumed.attrs[key], key
