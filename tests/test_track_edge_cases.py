"""Tracker edge cases: checkpointing, custom dims, degenerate inputs.

Mirrors the reference's tests/test_track_edge_cases.py coverage.
"""

import numpy as np
import pandas as pd
import pytest

import marex_tpu as marEx
from marex_tpu.core.field import Field

NY, NX = 30, 200


def blob_field(T=12, dimnames=("time", "lat", "lon"), coordnames=("time", "lat", "lon")):
    data = np.zeros((T, NY, NX), bool)
    yy, xx = np.mgrid[0:NY, 0:NX]
    for t in range(T):
        data[t] = (yy - 15) ** 2 + (xx - (40 + 3 * t)) ** 2 <= 25
    coords = {
        coordnames[0]: (dimnames[0], pd.date_range("2020-01-01", periods=T, freq="D").to_numpy()),
        coordnames[1]: (dimnames[1], np.linspace(-30, 30, NY)),
        coordnames[2]: (dimnames[2], np.linspace(0, 360, NX, endpoint=False)),
    }
    return Field(data, dimnames, coords=coords, name="extreme_events")


def simple_mask(dimnames=("lat", "lon"), coordnames=("lat", "lon")):
    return Field(
        np.ones((NY, NX), bool),
        dimnames,
        coords={
            coordnames[0]: (dimnames[0], np.linspace(-30, 30, NY)),
            coordnames[1]: (dimnames[1], np.linspace(0, 360, NX, endpoint=False)),
        },
    )


class TestCheckpointing:
    def test_save_then_load(self, tmp_path):
        da = blob_field()
        m = simple_mask()
        tr1 = marEx.tracker(
            da, m, R_fill=2, T_fill=0, area_filter_quartile=0.5, allow_merging=False,
            temp_dir=str(tmp_path), checkpoint="save",
        )
        events1 = tr1.run()

        tr2 = marEx.tracker(
            da, m, R_fill=2, T_fill=0, area_filter_quartile=0.5, allow_merging=False,
            temp_dir=str(tmp_path), checkpoint="load",
        )
        events2 = tr2.run()
        np.testing.assert_array_equal(events1.ID_field.values, events2.ID_field.values)
        assert events1.attrs["N_events_final"] == events2.attrs["N_events_final"]

    def test_staged_execution(self):
        da = blob_field()
        m = simple_mask()
        tr = marEx.tracker(da, m, R_fill=2, T_fill=0, area_filter_quartile=0.5, allow_merging=True)
        binary, stats = tr.run_preprocess()
        events, merges, n = tr.run_tracking(binary)
        events = tr.run_stats_attributes(events, merges, stats, n)
        assert events.attrs["N_events_final"] == n


class TestCustomDimensionNames:
    def test_custom_names(self):
        da = blob_field(dimnames=("t", "yy", "xx"), coordnames=("t", "latitude", "longitude"))
        m = simple_mask(dimnames=("yy", "xx"), coordnames=("latitude", "longitude"))
        tr = marEx.tracker(
            da,
            m,
            R_fill=2,
            T_fill=0,
            area_filter_quartile=0.5,
            allow_merging=True,
            dimensions={"time": "t", "y": "yy", "x": "xx"},
            coordinates={"time": "t", "y": "latitude", "x": "longitude"},
        )
        events = tr.run()
        assert events.ID_field.dims == ("t", "yy", "xx")
        assert events.attrs["N_events_final"] == 1


class TestDegenerateInputs:
    def test_no_objects_raises(self):
        da = blob_field()
        empty = Field(np.zeros_like(da.values), da.dims, da.coords)
        m = simple_mask()
        tr = marEx.tracker(empty, m, R_fill=2, area_filter_quartile=0.5)
        with pytest.raises(marEx.TrackingError):
            tr.run()

    def test_single_timestep(self):
        # two blobs: the globally-first object is always dropped by the area
        # filter (reference quirk object_ids_keep[0] = -1, track.py:1890-1891,
        # replicated for event parity), so the second blob survives alone
        da = blob_field(T=1)
        vals = np.array(da.values, copy=True)
        yy, xx = np.mgrid[0:NY, 0:NX]
        vals[0] |= (yy - 15) ** 2 + (xx - 120) ** 2 <= 25
        da = Field(vals, da.dims, da.coords, name="extreme_events")
        m = simple_mask()
        tr = marEx.tracker(da, m, R_fill=2, T_fill=0, area_filter_quartile=0.0, allow_merging=True)
        events = tr.run()
        assert events.attrs["N_events_final"] == 1

    def test_everything_filtered_yields_zero_events(self):
        da = blob_field(T=4)
        m = simple_mask()
        tr = marEx.tracker(da, m, R_fill=0, T_fill=0, area_filter_absolute=10_000, allow_merging=False)
        # all objects below the absolute threshold -> zero events, gracefully
        events = tr.run()
        assert events.attrs["N_events_final"] == 0
        assert (events.ID_field.values == 0).all()

    def test_radians_coordinates(self):
        da = blob_field()
        # convert coords to radians; auto-detection should handle ~2pi span
        lon_r = np.deg2rad(da.coords["lon"].values)
        lat_r = np.deg2rad(da.coords["lat"].values)
        da2 = Field(
            da.values,
            da.dims,
            coords={"time": da.coords["time"].values, "lat": lat_r, "lon": lon_r},
        )
        m = Field(np.ones((NY, NX), bool), ("lat", "lon"), coords={"lat": lat_r, "lon": lon_r})
        tr = marEx.tracker(da2, m, R_fill=2, T_fill=0, area_filter_quartile=0.5, allow_merging=True)
        assert tr.coordinate_units == "radians"
        events = tr.run()
        # coordinates restored to original radians on output
        assert np.allclose(events.coords["lon"].values, lon_r)
        # centroids remapped into radians range
        clon = events.centroid.values[1]
        assert np.nanmax(np.abs(clon)) < 2 * np.pi + 0.1
