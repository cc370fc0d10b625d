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


class TestParameterValidation:
    """Constructor-time rejection of invalid parameters (reference
    tests/test_track_edge_cases.py TestAreaFilteringValidation,
    TestGridResolutionValidation, TestDataValidationErrors)."""

    def test_negative_area_filter_absolute(self):
        with pytest.raises(marEx.ConfigurationError):
            marEx.tracker(blob_field(), simple_mask(), R_fill=2, area_filter_absolute=-5)

    def test_zero_area_filter_absolute(self):
        with pytest.raises(marEx.ConfigurationError):
            marEx.tracker(blob_field(), simple_mask(), R_fill=2, area_filter_absolute=0)

    def test_both_area_filters_rejected(self):
        with pytest.raises(marEx.ConfigurationError) as ei:
            marEx.tracker(
                blob_field(), simple_mask(), R_fill=2,
                area_filter_quartile=0.5, area_filter_absolute=10,
            )
        assert "mutually exclusive" in str(ei.value)

    @pytest.mark.parametrize("q", [-0.1, 1.5])
    def test_quartile_out_of_range(self, q):
        with pytest.raises(marEx.ConfigurationError):
            marEx.tracker(blob_field(), simple_mask(), R_fill=2, area_filter_quartile=q)

    @pytest.mark.parametrize("thr", [-0.2, 1.2])
    def test_overlap_threshold_out_of_range(self, thr):
        with pytest.raises(marEx.ConfigurationError):
            marEx.tracker(
                blob_field(), simple_mask(), R_fill=2,
                area_filter_quartile=0.5, overlap_threshold=thr,
            )

    def test_grid_resolution_with_unstructured_rejected(self):
        C = 64
        lat = np.linspace(-30, 30, C)
        lon = np.linspace(0, 350, C)
        ev = Field(
            np.ones((4, C), bool), ("time", "ncells"),
            coords={"time": pd.date_range("2020-01-01", periods=4).to_numpy(),
                    "lat": ("ncells", lat), "lon": ("ncells", lon)},
        )
        m = Field(np.ones(C, bool), ("ncells",), coords={"lat": ("ncells", lat), "lon": ("ncells", lon)})
        nb = np.full((3, C), -1, np.int32)
        with pytest.raises(marEx.DataValidationError):
            marEx.tracker(
                ev, m, R_fill=0, area_filter_quartile=0.5, unstructured_grid=True,
                dimensions={"x": "ncells"}, coordinates={"x": "lon", "y": "lat"},
                neighbours=nb, cell_areas=np.ones(C, np.float32),
                grid_resolution=0.25, coordinate_units="degrees",
            )

    @pytest.mark.parametrize("res", [0.0, -1.0])
    def test_nonpositive_grid_resolution_rejected(self, res):
        with pytest.raises(marEx.DataValidationError):
            marEx.tracker(
                blob_field(), simple_mask(), R_fill=2,
                area_filter_quartile=0.5, grid_resolution=res,
            )

    def test_non_boolean_data_rejected(self):
        da = blob_field()
        da_f = Field(da.values.astype(np.float32), da.dims, da.coords, name="extreme_events")
        with pytest.raises(marEx.DataValidationError) as ei:
            marEx.tracker(da_f, simple_mask(), R_fill=2, area_filter_quartile=0.5)
        assert "binary" in str(ei.value)

    def test_non_boolean_mask_rejected(self):
        m = simple_mask()
        m_f = Field(m.values.astype(np.int32), m.dims, m.coords)
        with pytest.raises(marEx.DataValidationError):
            marEx.tracker(blob_field(), m_f, R_fill=2, area_filter_quartile=0.5)

    def test_all_false_mask_rejected(self):
        m = simple_mask()
        m0 = Field(np.zeros_like(m.values), m.dims, m.coords)
        with pytest.raises(marEx.DataValidationError) as ei:
            marEx.tracker(blob_field(), m0, R_fill=2, area_filter_quartile=0.5)
        assert "only False" in str(ei.value)

    def test_invalid_merge_ledger_mode(self):
        with pytest.raises(marEx.ConfigurationError):
            marEx.tracker(
                blob_field(), simple_mask(), R_fill=2,
                area_filter_quartile=0.5, merge_ledger_mode="banana",
            )

    def test_missing_coordinates_rejected(self):
        da = blob_field()
        bare = Field(da.values, da.dims, coords={"time": da.coords["time"].values}, name="x")
        with pytest.raises(marEx.DataValidationError):
            marEx.tracker(bare, simple_mask(), R_fill=2, area_filter_quartile=0.5)


class TestGridResolutionAreas:
    """grid_resolution -> spherical cell areas (reference track.py:447-466)."""

    def test_cos_lat_scaling(self):
        tr = marEx.tracker(
            blob_field(), simple_mask(), R_fill=2, T_fill=0,
            area_filter_quartile=0.5, grid_resolution=1.0,
        )
        lat = np.linspace(-30, 30, NY)
        # rows near the equator carry larger cells than rows at |lat|=30
        mid = tr.cell_area[NY // 2, 0]
        edge = tr.cell_area[0, 0]
        assert mid > edge
        np.testing.assert_allclose(edge / mid, np.cos(np.deg2rad(lat[0])) / np.cos(np.deg2rad(lat[NY // 2])), rtol=2e-3)
        # all rows constant along x
        assert (tr.cell_area == tr.cell_area[:, :1]).all()

    def test_grid_resolution_overrides_cell_areas(self):
        custom = Field(np.full((NY, NX), 7.0, np.float32), ("lat", "lon"), simple_mask().coords)
        tr = marEx.tracker(
            blob_field(), simple_mask(), R_fill=2, T_fill=0,
            area_filter_quartile=0.5, grid_resolution=1.0, cell_areas=custom,
        )
        assert not np.allclose(tr.cell_area, 7.0)

    def test_unit_areas_by_default(self):
        tr = marEx.tracker(
            blob_field(), simple_mask(), R_fill=2, T_fill=0, area_filter_quartile=0.5,
        )
        assert (tr.cell_area == 1.0).all()


class TestAbsoluteAreaFiltering:
    def test_threshold_recorded_in_attrs(self):
        da = blob_field(T=6)
        tr = marEx.tracker(
            da, simple_mask(), R_fill=0, T_fill=0, area_filter_absolute=30, allow_merging=False,
        )
        events = tr.run()
        assert events.attrs["area_threshold (cells)"] == 30
        assert events.attrs["N_events_final"] >= 1

    def test_absolute_keeps_geq_semantics_gridded(self):
        # gridded filter keeps area >= threshold (reference track.py:1891)
        da = blob_field(T=4)  # blob area = 81 cells per slice (r^2<=25 disk)
        area = int(da.values[0].sum())
        tr = marEx.tracker(
            da, simple_mask(), R_fill=0, T_fill=0,
            area_filter_absolute=area, allow_merging=False,
        )
        events = tr.run()
        assert events.attrs["N_events_final"] == 1


class TestEmptyAttrsHandling:
    """Objects with empty or missing attrs flow through cleanly (reference
    TestEmptyAttrsHandling)."""

    def test_empty_attrs_dict(self):
        da = blob_field()
        da.attrs.clear()
        tr = marEx.tracker(da, simple_mask(), R_fill=2, T_fill=0, area_filter_quartile=0.5)
        events = tr.run()
        assert events.attrs["N_events_final"] >= 1

    def test_input_attrs_preserved(self):
        da = blob_field()
        da.attrs["source"] = "synthetic"
        tr = marEx.tracker(da, simple_mask(), R_fill=2, T_fill=0, area_filter_quartile=0.5)
        events = tr.run()
        assert events.attrs.get("source") == "synthetic"


class TestComplexMergeSplit:
    """Multi-parent merges and merges across temporal gaps (reference
    TestComplexMergeSplitValidation)."""

    @staticmethod
    def _three_way_merge_field():
        T = 8
        data = np.zeros((T, NY, NX), bool)
        yy, xx = np.mgrid[0:NY, 0:NX]
        # three blobs converging on x=100; distinct sizes so the quartile
        # filter (strict-> / >= semantics) cannot remove every parent
        for t in range(T):
            sep = max(18 - 4 * t, 0)
            for k, (cy, r) in enumerate([(10, 5), (15, 6), (20, 7)]):
                cx = 100 + (k - 1) * sep
                data[t] |= (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
        coords = {
            "time": pd.date_range("2021-01-01", periods=T, freq="D").to_numpy(),
            "lat": np.linspace(-30, 30, NY),
            "lon": np.linspace(0, 360, NX, endpoint=False),
        }
        return Field(data, ("time", "lat", "lon"), coords=coords, name="extreme_events")

    def test_three_way_merge_recorded(self):
        da = self._three_way_merge_field()
        tr = marEx.tracker(
            da, simple_mask(), R_fill=0, T_fill=0, area_filter_quartile=0.0,
            allow_merging=True, overlap_threshold=0.1,
        )
        events, merges = tr.run(return_merges=True)
        assert events.attrs["total_merges"] >= 1
        # at least one ledger row records more than one parent
        assert int(merges["n_parents"].values.max()) >= 2
        # parent ids padded with -1 beyond n_parents
        np_max = int(merges["n_parents"].values.max())
        assert merges["parent_IDs"].values.shape[1] >= np_max

    def test_merge_with_temporal_fill(self):
        # two blobs approach, the joined object blinks out for one step,
        # T_fill=2 bridges the gap and the merge is still recorded
        T = 10
        data = np.zeros((T, NY, NX), bool)
        yy, xx = np.mgrid[0:NY, 0:NX]
        for t in range(T):
            if t == 6:
                continue  # gap
            sep = max(16 - 3 * t, 0)
            data[t] |= (yy - 15) ** 2 + (xx - (100 - sep)) ** 2 <= 25
            data[t] |= (yy - 12) ** 2 + (xx - (100 + sep)) ** 2 <= 36
        coords = {
            "time": pd.date_range("2021-01-01", periods=T, freq="D").to_numpy(),
            "lat": np.linspace(-30, 30, NY),
            "lon": np.linspace(0, 360, NX, endpoint=False),
        }
        da = Field(data, ("time", "lat", "lon"), coords=coords, name="extreme_events")
        tr = marEx.tracker(
            da, simple_mask(), R_fill=0, T_fill=2, area_filter_quartile=0.0,
            allow_merging=True, overlap_threshold=0.1,
        )
        events = tr.run()
        assert events.attrs["total_merges"] >= 1
        # the gap timestep was filled: event alive at t=6
        assert (events.ID_field.values[6] > 0).any()

    def test_overlap_threshold_zero_links_everything(self):
        da = self._three_way_merge_field()
        tr = marEx.tracker(
            da, simple_mask(), R_fill=0, T_fill=0, area_filter_quartile=0.0,
            allow_merging=True, overlap_threshold=0.0,
        )
        events = tr.run()
        assert events.attrs["N_events_final"] >= 1


class TestCheckpointEdgeCases:
    def test_checkpoint_load_missing_raises(self, tmp_path):
        tr = marEx.tracker(
            blob_field(), simple_mask(), R_fill=2, T_fill=0,
            area_filter_quartile=0.5, temp_dir=str(tmp_path), checkpoint="load",
        )
        with pytest.raises(marEx.TrackingError) as ei:
            tr.run()
        assert "checkpoint" in str(ei.value).lower()

    def test_checkpoint_auto_saves_then_resumes(self, tmp_path):
        da = blob_field()
        tr1 = marEx.tracker(
            da, simple_mask(), R_fill=2, T_fill=0, area_filter_quartile=0.5,
            temp_dir=str(tmp_path), checkpoint="auto",
        )
        e1 = tr1.run()
        # second auto run resumes from the saved stage checkpoint
        tr2 = marEx.tracker(
            da, simple_mask(), R_fill=2, T_fill=0, area_filter_quartile=0.5,
            temp_dir=str(tmp_path), checkpoint="auto",
        )
        e2 = tr2.run()
        np.testing.assert_array_equal(e1.ID_field.values, e2.ID_field.values)
