"""Gridded tracking tests: moving blobs, merging, gap filling, filtering.

Mirrors the reference's tracking test strategy (tests/test_gridded_tracking.py):
event counts within small tolerances, blob-following ID fields, merge ledger
behaviour, T_fill gap continuity, and validation error paths.
"""

import numpy as np
import pandas as pd
import pytest

import marex_tpu as marEx
from marex_tpu.core.field import Field

from .conftest import assert_count_in_reasonable_range

NY, NX = 40, 240


def _grid_coords(T, start="2020-01-01"):
    return {
        "time": pd.date_range(start, periods=T, freq="D").to_numpy(),
        "lat": np.linspace(-40, 40, NY),
        "lon": np.linspace(0, 360, NX, endpoint=False),
    }


def make_blob_field(T=30, r=6, path=None):
    """Binary field with one circular blob following `path` (list of (y, x))."""
    data = np.zeros((T, NY, NX), bool)
    yy, xx = np.mgrid[0:NY, 0:NX]
    for t in range(T):
        cy, cx = path(t)
        dx = np.minimum(np.abs(xx - cx), NX - np.abs(xx - cx))
        data[t] = (yy - cy) ** 2 + dx**2 <= r**2
    return Field(data, ("time", "lat", "lon"), coords=_grid_coords(T), name="extreme_events")


def with_decoy(field):
    """Add a tiny first-labeled object at the top-left of t=0: the tracker
    replicates the reference's drop-first-object quirk (object_ids_keep[0]
    = -1, track.py:1890-1891), so single-blob tests seed a sacrificial decoy
    that absorbs it (the decoy is below the area threshold anyway)."""
    vals = np.array(field.values, copy=True)
    # 6x6: survives the R_fill=2 opening but stays below the r=6 blobs' area
    vals[0, 0:6, 0:6] = True
    return Field(vals, field.dims, field.coords, name=field.name)


def ocean_mask():
    return Field(np.ones((NY, NX), bool), ("lat", "lon"), coords={"lat": np.linspace(-40, 40, NY), "lon": np.linspace(0, 360, NX, endpoint=False)}, name="mask")


class TestBasicTracking:
    def test_single_moving_blob_no_merging(self):
        da = with_decoy(make_blob_field(T=30, path=lambda t: (20, 30 + 3 * t)))
        tr = marEx.tracker(da, ocean_mask(), R_fill=2, area_filter_quartile=0.5, T_fill=0, allow_merging=False)
        events = tr.run()
        assert "ID_field" in events
        ids = events.ID_field.values
        assert ids.max() == 1  # one coherent event
        assert events.attrs["N_events_final"] == 1
        # blob present at every timestep
        assert (ids.reshape(30, -1).max(axis=1) == 1).all()

    def test_blob_wraps_through_lon_boundary(self):
        # blob crosses the periodic boundary mid-track; quartile 0 so the
        # reference-faithful seam nibbling (2R-pad morphology, see
        # ops/morphology.binary_close_open_grid) cannot drop the thinner
        # seam-crossing slices below the area threshold — this asserts the
        # periodic continuity of the labeling itself
        da = with_decoy(make_blob_field(T=30, path=lambda t: (20, (225 + 3 * t) % NX)))
        tr = marEx.tracker(da, ocean_mask(), R_fill=2, area_filter_quartile=0.0, T_fill=0, allow_merging=False)
        events = tr.run()
        assert events.ID_field.values.max() == 1

    def test_single_blob_with_merging_enabled(self):
        da = with_decoy(make_blob_field(T=24, path=lambda t: (20, 40 + 2 * t)))
        tr = marEx.tracker(da, ocean_mask(), R_fill=2, area_filter_quartile=0.5, T_fill=0, allow_merging=True)
        events, merges = tr.run(return_merges=True)
        for var in ("ID_field", "global_ID", "area", "centroid", "presence", "time_start", "time_end", "merge_ledger"):
            assert var in events, var
        assert events.attrs["N_events_final"] == 1
        assert events.attrs["total_merges"] == 0
        # presence is continuous over the event lifetime
        pres = events.presence.values[:, 0]
        assert pres.all()
        # area positive wherever present
        area = events.area.values[:, 0]
        assert np.isfinite(area).all() and (area > 0).all()

    def test_centroid_tracks_blob(self):
        da = with_decoy(make_blob_field(T=20, path=lambda t: (20, 60 + 4 * t)))
        tr = marEx.tracker(da, ocean_mask(), R_fill=2, area_filter_quartile=0.5, T_fill=0, allow_merging=True)
        events = tr.run()
        clon = events.centroid.values[1, :, 0]  # component 1 = lon
        lon_vals = np.linspace(0, 360, NX, endpoint=False)
        expected = lon_vals[(60 + 4 * np.arange(20)) % NX]
        np.testing.assert_allclose(clon, expected, atol=2.0)

    def test_two_separate_blobs(self):
        def path_pair(t):
            return (10, 40 + 2 * t)

        da1 = make_blob_field(T=20, path=path_pair)
        da2 = make_blob_field(T=20, path=lambda t: (32, 160 + 2 * t))
        da = Field(da1.values | da2.values, da1.dims, da1.coords, name="extreme_events")
        tr = marEx.tracker(da, ocean_mask(), R_fill=2, area_filter_quartile=0.0, T_fill=0, allow_merging=True)
        events = tr.run()
        assert events.attrs["N_events_final"] == 2


class TestTemporalGapFilling:
    def _gappy_blob(self, gap):
        T = 24
        data = np.zeros((T, NY, NX), bool)
        yy, xx = np.mgrid[0:NY, 0:NX]
        blob = (yy - 20) ** 2 + (xx - 100) ** 2 <= 36
        for t in range(T):
            if not (10 <= t < 10 + gap):
                data[t] = blob
        return Field(data, ("time", "lat", "lon"), coords=_grid_coords(T), name="extreme_events")

    def test_gap_filled_with_t_fill(self):
        da = self._gappy_blob(gap=2)
        tr = marEx.tracker(da, ocean_mask(), R_fill=2, T_fill=2, area_filter_quartile=0.5, allow_merging=False)
        events = tr.run()
        assert events.attrs["N_events_final"] == 1
        ids = events.ID_field.values
        assert ids[11].max() == 1  # gap timestep filled

    def test_gap_splits_without_t_fill(self):
        da = self._gappy_blob(gap=2)
        tr = marEx.tracker(da, ocean_mask(), R_fill=2, T_fill=0, area_filter_quartile=0.5, allow_merging=False)
        events = tr.run()
        assert events.attrs["N_events_final"] == 2

    def test_large_gap_not_filled(self):
        da = self._gappy_blob(gap=6)
        tr = marEx.tracker(da, ocean_mask(), R_fill=2, T_fill=2, area_filter_quartile=0.5, allow_merging=False)
        events = tr.run()
        assert events.attrs["N_events_final"] == 2


class TestMergingSplitting:
    def _merging_blobs(self, T=20):
        """Two blobs approach and merge at about t=10."""
        data = np.zeros((T, NY, NX), bool)
        yy, xx = np.mgrid[0:NY, 0:NX]
        for t in range(T):
            cxa = 90 + 2 * t  # moves right
            cxb = 150 - 2 * t  # moves left
            a = (yy - 20) ** 2 + (xx - cxa) ** 2 <= 49
            b = (yy - 20) ** 2 + (xx - cxb) ** 2 <= 49
            data[t] = a | b
        return Field(data, ("time", "lat", "lon"), coords=_grid_coords(T), name="extreme_events")

    @pytest.mark.parametrize("nn_partitioning", [False, True])
    def test_merge_preserves_identities(self, nn_partitioning):
        da = self._merging_blobs()
        tr = marEx.tracker(
            da,
            ocean_mask(),
            R_fill=2,
            T_fill=0,
            area_filter_quartile=0.0,
            allow_merging=True,
            nn_partitioning=nn_partitioning,
            overlap_threshold=0.3,
        )
        events, merges = tr.run(return_merges=True)
        # the two parent identities persist through the merge
        assert_count_in_reasonable_range(events.attrs["N_events_final"], 2, tolerance=1)
        assert events.attrs["total_merges"] >= 1
        assert "parent_IDs" in merges
        n_parents = merges.n_parents.values
        assert (n_parents >= 2).any()

    def test_merge_ledger_reference_scheme_default(self):
        # default mode replicates the reference (track.py:3040-3106): each
        # merging parent's row holds its OWN event id in every sibling slot
        da = self._merging_blobs()
        tr = marEx.tracker(
            da, ocean_mask(), R_fill=2, T_fill=0, area_filter_quartile=0.0, allow_merging=True, overlap_threshold=0.3
        )
        events = tr.run()
        ledger = np.asarray(events.merge_ledger.values)
        assert (ledger > 0).any()  # at least one recorded merge
        ids = np.asarray(events.merge_ledger.coords["ID"].values)
        marked = ledger[:, :, 0] > 0
        own = np.broadcast_to(ids[None, :], marked.shape)
        for s in range(ledger.shape[2]):
            assert np.array_equal(ledger[:, :, s][marked], own[marked])

    def test_merge_ledger_sibling_mode_optin(self):
        # merge_ledger_mode='siblings' records the full merge-partner list
        da = self._merging_blobs()
        tr = marEx.tracker(
            da,
            ocean_mask(),
            R_fill=2,
            T_fill=0,
            area_filter_quartile=0.0,
            allow_merging=True,
            overlap_threshold=0.3,
            merge_ledger_mode="siblings",
        )
        events = tr.run()
        ledger = np.asarray(events.merge_ledger.values)
        # some parent's row must reference a DIFFERENT event (its sibling)
        ids = np.asarray(events.merge_ledger.coords["ID"].values)
        marked = np.nonzero(ledger[:, :, 0] > 0)
        has_partner = False
        for t, i in zip(*marked):
            row = ledger[t, i]
            if (row[(row > 0) & (row != ids[i])]).size:
                has_partner = True
        assert has_partner

    def test_classic_merging_gives_single_event(self):
        # without split/merge logic, 3-D connectivity fuses the pair into one event
        da = self._merging_blobs()
        tr = marEx.tracker(da, ocean_mask(), R_fill=2, T_fill=0, area_filter_quartile=0.0, allow_merging=False)
        events = tr.run()
        assert events.attrs["N_events_final"] == 1


class TestAreaFiltering:
    def _two_size_blobs(self):
        T = 10
        data = np.zeros((T, NY, NX), bool)
        yy, xx = np.mgrid[0:NY, 0:NX]
        big = (yy - 20) ** 2 + (xx - 60) ** 2 <= 64
        small = (yy - 20) ** 2 + (xx - 180) ** 2 <= 4
        for t in range(T):
            data[t] = big | small
        return Field(data, ("time", "lat", "lon"), coords=_grid_coords(T), name="extreme_events")

    def test_absolute_filter_removes_small(self):
        da = self._two_size_blobs()
        tr = marEx.tracker(da, ocean_mask(), R_fill=0, T_fill=0, area_filter_absolute=50, allow_merging=False)
        events = tr.run()
        assert events.attrs["N_events_final"] == 1

    def test_quartile_filter(self):
        da = self._two_size_blobs()
        tr = marEx.tracker(da, ocean_mask(), R_fill=0, T_fill=0, area_filter_quartile=0.5, allow_merging=False)
        events = tr.run()
        assert events.attrs["N_events_final"] == 1

    def test_no_filter_keeps_both(self):
        da = self._two_size_blobs()
        tr = marEx.tracker(da, ocean_mask(), R_fill=0, T_fill=0, area_filter_absolute=1, allow_merging=False)
        events = tr.run()
        assert events.attrs["N_events_final"] == 2


class TestValidation:
    def test_odd_t_fill_rejected(self):
        da = make_blob_field(T=5, path=lambda t: (20, 100))
        with pytest.raises(marEx.ConfigurationError):
            marEx.tracker(da, ocean_mask(), R_fill=2, T_fill=3, area_filter_quartile=0.5)

    def test_both_area_filters_rejected(self):
        da = make_blob_field(T=5, path=lambda t: (20, 100))
        with pytest.raises(marEx.ConfigurationError):
            marEx.tracker(da, ocean_mask(), R_fill=2, area_filter_quartile=0.5, area_filter_absolute=10)

    def test_non_boolean_data_rejected(self):
        da = make_blob_field(T=5, path=lambda t: (20, 100)).astype(np.int32)
        with pytest.raises(marEx.DataValidationError):
            marEx.tracker(da, ocean_mask(), R_fill=2, area_filter_quartile=0.5)

    def test_all_false_mask_rejected(self):
        da = make_blob_field(T=5, path=lambda t: (20, 100))
        m = ocean_mask()
        bad_mask = Field(np.zeros((NY, NX), bool), m.dims, m.coords)
        with pytest.raises(marEx.DataValidationError):
            marEx.tracker(da, bad_mask, R_fill=2, area_filter_quartile=0.5)

    def test_invalid_quartile_rejected(self):
        da = make_blob_field(T=5, path=lambda t: (20, 100))
        with pytest.raises(marEx.ConfigurationError):
            marEx.tracker(da, ocean_mask(), R_fill=2, area_filter_quartile=1.5)

    def test_stats_attrs_present(self):
        da = make_blob_field(T=10, path=lambda t: (20, 100 + 2 * t))
        tr = marEx.tracker(da, ocean_mask(), R_fill=2, T_fill=0, area_filter_quartile=0.5, allow_merging=True)
        events = tr.run()
        for attr in (
            "allow_merging",
            "N_objects_prefiltered",
            "N_objects_filtered",
            "N_events_final",
            "R_fill",
            "T_fill",
            "area_filter_quartile",
            "preprocessed_area_fraction",
            "total_merges",
        ):
            assert attr in events.attrs, attr


class TestRegionalMode:
    def _regional_blob(self):
        T = 12
        data = np.zeros((T, NY, NX), bool)
        yy, xx = np.mgrid[0:NY, 0:NX]
        for t in range(T):
            data[t] = (yy - 20) ** 2 + (xx - (30 + 3 * t)) ** 2 <= 25
        coords = {
            "time": pd.date_range("2020-01-01", periods=T, freq="D").to_numpy(),
            "lat": np.linspace(30, 60, NY),
            "lon": np.linspace(-20, 30, NX),  # regional, 50-degree span
        }
        return Field(data, ("time", "lat", "lon"), coords=coords, name="extreme_events")

    def test_regional_tracker_runs(self):
        da = self._regional_blob()
        m = Field(np.ones((NY, NX), bool), ("lat", "lon"), coords={"lat": da.coords["lat"].values, "lon": da.coords["lon"].values})
        tr = marEx.regional_tracker(da, m, coordinate_units="degrees", R_fill=2, area_filter_quartile=0.5, T_fill=0)
        events = tr.run()
        assert events.attrs["N_events_final"] == 1

    def test_regional_requires_units(self):
        da = self._regional_blob()
        m = Field(np.ones((NY, NX), bool), ("lat", "lon"), coords={"lat": da.coords["lat"].values, "lon": da.coords["lon"].values})
        with pytest.raises(marEx.CoordinateError):
            marEx.tracker(da, m, R_fill=2, area_filter_quartile=0.5, regional_mode=True)

    def test_nonglobal_without_regional_mode_rejected(self):
        da = self._regional_blob()
        m = Field(np.ones((NY, NX), bool), ("lat", "lon"), coords={"lat": da.coords["lat"].values, "lon": da.coords["lon"].values})
        with pytest.raises(marEx.CoordinateError):
            marEx.tracker(da, m, R_fill=2, area_filter_quartile=0.5)


class TestMidLevelAPI:
    def test_identify_objects_and_properties(self):
        da = make_blob_field(T=6, path=lambda t: (20, 60 + 4 * t))
        tr = marEx.tracker(da, ocean_mask(), R_fill=0, T_fill=0, area_filter_quartile=0.0, allow_merging=True)
        labels, _, n = tr.identify_objects(da.values, time_connectivity=False)
        assert n == 6  # one object per timestep, globally unique ids
        props = tr.calculate_object_properties(labels)
        assert len(props.area.values) == 6
        assert np.allclose(props.area.values, 113.0)  # r=6 disk
        # centroids near y=20
        assert np.allclose(props.centroid.values[0], 20.0, atol=0.5)

    def test_identify_objects_3d(self):
        da = make_blob_field(T=6, path=lambda t: (20, 60 + 2 * t))
        tr = marEx.tracker(da, ocean_mask(), R_fill=0, T_fill=0, area_filter_quartile=0.0, allow_merging=False)
        labels, _, n = tr.identify_objects(da.values, time_connectivity=True)
        assert n == 1

    def test_overlap_methods(self):
        da = make_blob_field(T=4, path=lambda t: (20, 60 + 2 * t))
        tr = marEx.tracker(da, ocean_mask(), R_fill=0, T_fill=0, area_filter_quartile=0.0, allow_merging=True)
        labels, _, _ = tr.identify_objects(da.values)
        lv = np.asarray(labels.values)
        pairs = tr.check_overlap_slice(lv[0], lv[1])
        assert pairs.shape[1] == 3 and len(pairs) == 1
        allpairs = tr.find_overlapping_objects(lv)
        assert len(allpairs) == 3  # 3 consecutive transitions


class TestSplittingAndPhysics:
    """Splitting genealogy, physical areas, and overlap-threshold
    sensitivity (reference yardstick: test_gridded_tracking.py)."""

    def test_split_keeps_single_event(self):
        """One blob splits into two pieces that both persist: the overlap
        graph keeps both children in the parent's event (splits do not mint
        new events), and the merge ledger stays empty."""
        T = 24
        data = np.zeros((T, NY, NX), bool)
        yy, xx = np.mgrid[0:NY, 0:NX]
        for t in range(T):
            if t < 10:
                data[t] = (yy - 20) ** 2 + (xx - 60) ** 2 <= 100  # one wide blob
            else:
                off = min(4 + (t - 10) * 2, 14)
                data[t] |= (yy - 20) ** 2 + (xx - (60 - off)) ** 2 <= 30
                data[t] |= (yy - 20) ** 2 + (xx - (60 + off)) ** 2 <= 30
        data[0, 0:6, 200:206] = True  # first-object decoy
        da = Field(data, ("time", "lat", "lon"), coords=_grid_coords(T), name="extreme_events")
        events, merges = marEx.tracker(
            da, ocean_mask(), R_fill=1, T_fill=0, area_filter_quartile=0.0,
            allow_merging=True, overlap_threshold=0.2, quiet=True,
        ).run(return_merges=True)
        assert events.attrs["total_merges"] == 0
        ids = np.asarray(events.ID_field.values)
        blob_event = np.unique(ids[5][ids[5] > 0])
        assert len(blob_event) == 1
        after = np.unique(ids[T - 1][ids[T - 1] > 0])
        # both split pieces still carry the original event id
        assert list(after) == list(blob_event)

    def test_grid_resolution_physical_areas(self):
        """grid_resolution switches areas to spherical km^2: equatorial
        events report larger areas than identical-footprint polar events."""
        T = 6
        data = np.zeros((T, NY, NX), bool)
        data[:, 18:22, 60:70] = True    # near equator (lat ~ 0)
        data[:, 36:40, 160:170] = True  # near +40 lat
        data[0, 0:3, 200:203] = True    # decoy
        da = Field(data, ("time", "lat", "lon"), coords=_grid_coords(T), name="extreme_events")
        events = marEx.tracker(
            da, ocean_mask(), R_fill=0, T_fill=0, area_filter_absolute=5,
            allow_merging=True, grid_resolution=1.5, quiet=True,
        ).run()
        areas = np.asarray(events.area.values)  # (T, ID)
        a = np.nanmean(areas, axis=0)
        assert len(a) == 2
        # equator cells are larger; identical pixel footprints -> area ratio
        # ~ cos(0)/cos(38deg) > 1.2
        assert a.max() / a.min() > 1.2
        # magnitudes are physical: a 4x10-cell patch of 1.5-degree cells at
        # the equator is ~ 4*10 * (1.5*111km)^2 ~ 1.1e6 km^2
        assert 2e5 < a.max() < 5e6

    def test_overlap_threshold_sensitivity(self):
        """A fast-moving blob (small frame-to-frame overlap) stays one event
        at a permissive threshold and fragments at a strict one."""
        path = lambda t: (20, 10 + 9 * t)  # ~75% displacement per step at r=6
        da = with_decoy(make_blob_field(T=18, r=6, path=path))
        kw = dict(R_fill=1, T_fill=0, area_filter_quartile=0.0, allow_merging=True, quiet=True)
        ev_loose = marEx.tracker(da, ocean_mask(), overlap_threshold=0.05, **kw).run()
        ev_strict = marEx.tracker(da, ocean_mask(), overlap_threshold=0.9, **kw).run()
        assert ev_loose.attrs["N_events_final"] < ev_strict.attrs["N_events_final"]

    def test_time_start_end_consistent_with_presence(self):
        da = with_decoy(make_blob_field(T=20, path=lambda t: (20, 40 + 2 * t)))
        events = marEx.tracker(
            da, ocean_mask(), R_fill=2, T_fill=0, area_filter_quartile=0.5,
            allow_merging=True, quiet=True,
        ).run()
        presence = np.asarray(events.presence.values)
        tvals = np.asarray(events.ID_field.coords["time"].values)
        for j in range(presence.shape[1]):
            col = presence[:, j]
            if col.any():
                assert events.time_start.values[j] == tvals[int(np.argmax(col))]
                assert events.time_end.values[j] == tvals[len(col) - 1 - int(np.argmax(col[::-1]))]
