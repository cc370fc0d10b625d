"""End-to-end integration tests: full detect -> track pipelines.

Mirrors the reference's integration coverage (tests/test_integration.py):
method-combination consistency, gridded & unstructured full pipelines, and
output contract checks across stage boundaries.
"""

import numpy as np
import pytest

import marex_tpu as marEx

from .conftest import make_gridded_sst


class TestGriddedPipeline:
    @pytest.fixture(scope="class")
    def sst(self):
        # larger zonal grid so tracking has room (and EDGE_ZONE semantics
        # hold); sized for the single-core CPU test backend
        return make_gridded_sst(n_years=6, ny=24, nx=128, seed=21)

    @pytest.fixture(scope="class")
    def ds_fixed_exact(self, sst):
        # shared by three tests below (identical detect settings); one
        # preprocess instead of three keeps the suite's wall-time down
        return marEx.preprocess_data(
            sst,
            method_anomaly="fixed_baseline",
            method_extreme="global_extreme",
            method_percentile="exact",
            threshold_percentile=95,
        )

    def test_fixed_global_exact_to_tracker(self, sst, ds_fixed_exact):
        ds = ds_fixed_exact
        tr = marEx.tracker(
            ds.extreme_events,
            ds.mask,
            R_fill=4,
            T_fill=2,
            area_filter_quartile=0.5,
            allow_merging=False,
        )
        events = tr.run()
        n = events.attrs["N_events_final"]
        assert n > 0
        ids = events.ID_field.values
        assert ids.max() == n
        # IDs only on ocean
        land = ~ds.mask.values
        assert (ids[:, land] == 0).all()

    def test_full_merge_pipeline(self, sst):
        ds = marEx.preprocess_data(
            sst,
            method_anomaly="detrend_harmonic",
            method_extreme="hobday_extreme",
            method_percentile="approximate",
            window_spatial_hobday=3,
            threshold_percentile=95,
        )
        tr = marEx.tracker(
            ds.extreme_events,
            ds.mask,
            R_fill=4,
            T_fill=2,
            area_filter_quartile=0.5,
            allow_merging=True,
            overlap_threshold=0.5,
        )
        events, merges = tr.run(return_merges=True)
        n = events.attrs["N_events_final"]
        assert n > 0
        # structural invariants of the output contract
        assert events.global_ID.dims == ("time", "ID")
        assert events.area.dims == ("time", "ID")
        assert events.centroid.dims == ("component", "time", "ID")
        assert events.presence.dims == ("time", "ID")
        assert events.merge_ledger.dims == ("time", "ID", "sibling_ID")
        assert events.presence.sizes["ID"] == n
        # presence matches the ID field content
        ids = events.ID_field.values
        present_in_field = np.zeros((ids.shape[0], n + 1), bool)
        for t in range(ids.shape[0]):
            u = np.unique(ids[t])
            present_in_field[t, u[u > 0]] = True
        np.testing.assert_array_equal(events.presence.values, present_in_field[:, 1:])
        # areas: positive where present, NaN where absent
        area = events.area.values
        pres = events.presence.values
        assert (area[pres] > 0).all()
        assert np.isnan(area[~pres]).all()
        # time_start <= time_end
        assert (events.time_start.values <= events.time_end.values).all()

    def test_grid_resolution_areas(self, sst, ds_fixed_exact):
        ds = ds_fixed_exact
        tr = marEx.tracker(
            ds.extreme_events,
            ds.mask,
            R_fill=4,
            T_fill=0,
            area_filter_quartile=0.5,
            allow_merging=True,
            grid_resolution=1.5,
        )
        events = tr.run()
        area = events.area.values
        pres = events.presence.values
        # physical km^2 cell areas at 1.5 deg: single-cell area ~ up to 2.7e4
        assert np.nanmean(area[pres]) > 1e3

    def test_method_consistency(self, sst, ds_fixed_exact):
        """Different anomaly methods produce broadly consistent event activity."""
        ds_detrend = marEx.preprocess_data(
            sst, method_anomaly="detrend_harmonic", method_extreme="global_extreme", method_percentile="exact"
        )
        counts = {
            "fixed_baseline": float(ds_fixed_exact.extreme_events.values.mean()),
            "detrend_harmonic": float(ds_detrend.extreme_events.values.mean()),
        }
        ratio = counts["fixed_baseline"] / counts["detrend_harmonic"]
        assert 0.5 < ratio < 2.0


class TestCheckpointing:
    def test_zarr_roundtrip_of_detect_output(self, tmp_path):
        from marex_tpu.io import open_zarr, to_zarr

        sst = make_gridded_sst(n_years=4, ny=12, nx=24, seed=5)
        ds = marEx.preprocess_data(
            sst, method_anomaly="fixed_baseline", method_extreme="global_extreme", method_percentile="exact"
        )
        path = str(tmp_path / "detect.zarr")
        to_zarr(ds, path)
        back = open_zarr(path)
        np.testing.assert_allclose(
            back.dat_anomaly.values, ds.dat_anomaly.values, rtol=1e-6, atol=1e-6, equal_nan=True
        )
        np.testing.assert_array_equal(back.extreme_events.values, ds.extreme_events.values)

    def test_tracker_output_roundtrip(self, tmp_path):
        from marex_tpu.io import open_zarr, to_zarr

        sst = make_gridded_sst(n_years=4, ny=16, nx=128, seed=6, with_land=False)
        ds = marEx.preprocess_data(
            sst, method_anomaly="fixed_baseline", method_extreme="global_extreme", method_percentile="exact"
        )
        tr = marEx.tracker(
            ds.extreme_events, ds.mask, R_fill=2, T_fill=0, area_filter_quartile=0.5, allow_merging=False
        )
        events = tr.run()
        path = str(tmp_path / "events.zarr")
        to_zarr(events, path)
        back = open_zarr(path)
        np.testing.assert_array_equal(back.ID_field.values, events.ID_field.values)
        assert back.attrs["N_events_final"] == events.attrs["N_events_final"]


class TestMethodMatrix:
    """Every anomaly x extreme x percentile combination runs end-to-end
    (detect -> track) with statistically sane extremes — the reference's
    method-combination consistency sweep (test_integration.py)."""

    @pytest.mark.parametrize("method_anomaly", [
        "fixed_baseline", "detrend_harmonic", "shifting_baseline", "detrend_fixed_baseline",
    ])
    @pytest.mark.parametrize("method_extreme,method_percentile", [
        ("global_extreme", "exact"),
        ("global_extreme", "approximate"),
        ("hobday_extreme", "approximate"),
    ])
    def test_combo_end_to_end(self, method_anomaly, method_extreme, method_percentile):
        sst = make_gridded_sst(n_years=12, ny=12, nx=24, seed=5)
        kw = dict(
            method_anomaly=method_anomaly,
            method_extreme=method_extreme,
            method_percentile=method_percentile,
            threshold_percentile=90,
            quiet=True,
        )
        if method_anomaly == "shifting_baseline":
            kw.update(window_year_baseline=5, smooth_days_baseline=11)
        if method_extreme == "hobday_extreme":
            kw.update(window_days_hobday=11)
        ds = marEx.preprocess_data(sst, **kw)
        freq = float(np.asarray(ds.extreme_events.data)[:, np.asarray(ds.mask.values)].mean())
        # 90th percentile -> ~10% frequency (shifting_baseline trims early years)
        assert 0.04 < freq < 0.2, f"{method_anomaly}/{method_extreme}/{method_percentile}: freq={freq}"

        events = marEx.tracker(
            ds.extreme_events, ds.mask, R_fill=1, T_fill=0,
            area_filter_quartile=0.5, allow_merging=True, overlap_threshold=0.25, quiet=True,
        ).run()
        assert events.attrs["N_events_final"] > 0
        assert set(events.data_vars) >= {"ID_field", "global_ID", "area", "centroid", "presence"}
