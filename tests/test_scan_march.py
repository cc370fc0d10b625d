"""Scan-march equivalence: the single-program on-device merge march
(``ops/march.scan_march``) must reproduce the per-step device march
(``tracker._split_and_merge_device``) exactly — same ID fields, same object
tables, same merge ledgers — on merge-dense, centroid, regional and
no-merge inputs. This pins the semantics the reference defines sequentially
(track.py:3337-3802) for the batched formulation.
"""

import numpy as np
import pandas as pd
import pytest

import marex_tpu as marEx
from marex_tpu.core.field import Field

NY, NX = 48, 180


def _coords(T):
    return {
        "time": pd.date_range("2021-01-01", periods=T, freq="D").to_numpy(),
        "lat": np.linspace(-40, 40, NY),
        "lon": np.linspace(0, 360, NX, endpoint=False),
    }


def _mask():
    return Field(
        np.ones((NY, NX), bool),
        ("lat", "lon"),
        coords={"lat": np.linspace(-40, 40, NY), "lon": np.linspace(0, 360, NX, endpoint=False)},
        name="mask",
    )


def merge_dense_field(T=60, n_pairs=5, seed=3):
    """Blob pairs that converge, merge and separate every 20 steps (the
    config-6 stress pattern at test scale)."""
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
    return Field(data, ("time", "lat", "lon"), coords=_coords(T), name="extreme_events")


def _run(da, scan: bool, **kw):
    kwargs = dict(
        R_fill=2,
        T_fill=0,
        area_filter_quartile=0.0,
        allow_merging=True,
        overlap_threshold=0.3,
        quiet=True,
    )
    kwargs.update(kw)
    tr = marEx.tracker(da, _mask(), **kwargs)
    tr.use_scan_march = scan
    events, merges = tr.run(return_merges=True)
    return events, merges, tr


def _assert_equal_runs(run_scan, run_step):
    ev_scan, mg_scan = run_scan
    ev_step, mg_step = run_step
    np.testing.assert_array_equal(ev_scan.ID_field.values, ev_step.ID_field.values)
    assert ev_scan.attrs["N_events_final"] == ev_step.attrs["N_events_final"]
    assert ev_scan.attrs["total_merges"] == ev_step.attrs["total_merges"]
    for name in ("presence", "area", "centroid", "merge_ledger"):
        if name in ev_scan.data_vars:
            np.testing.assert_allclose(
                np.nan_to_num(np.asarray(ev_scan[name].values, dtype=np.float64), nan=-999.0),
                np.nan_to_num(np.asarray(ev_step[name].values, dtype=np.float64), nan=-999.0),
                rtol=1e-6,
                atol=1e-6,
            )
    # merge genealogy rows must match exactly (order included)
    for name in ("parent_IDs", "child_IDs", "overlap_areas", "merge_time", "n_parents"):
        if name in mg_scan.data_vars:
            a, b = mg_scan[name].values, mg_step[name].values
            if np.issubdtype(np.asarray(a).dtype, np.floating):
                np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)
            else:
                np.testing.assert_array_equal(a, b)


class TestScanMarchParity:
    @pytest.mark.parametrize("nn", [True, False], ids=["nn", "centroid"])
    def test_merge_dense_equivalence(self, nn):
        da = merge_dense_field()
        ev_scan, mg_scan, tr_scan = _run(da, True, nn_partitioning=nn)
        ev_step, mg_step, _ = _run(da, False, nn_partitioning=nn)
        assert ev_scan.attrs["total_merges"] > 0
        # proves the scan path actually ran (3 dispatches, not per-step)
        assert "march_scan" in tr_scan.dispatch_counts
        _assert_equal_runs((ev_scan, mg_scan), (ev_step, mg_step))

    def test_regional_equivalence(self):
        """Non-wrapping longitude: regional trackers use wrap=False EDT."""
        T = 40
        data = np.zeros((T, NY, NX), bool)
        yy, xx = np.mgrid[0:NY, 0:NX]
        for t in range(T):
            phase = (t % 20) / 20.0
            sep = int((1.0 - min(phase * 2, 1.0)) * 12) + 4
            for cx0 in (40, 100):
                for s in (-sep, sep):
                    data[t] |= (yy - 24) ** 2 + (xx - (cx0 + s)) ** 2 <= 16
        coords = _coords(T)
        coords["lon"] = np.linspace(10, 60, NX)  # non-global span -> regional
        da = Field(data, ("time", "lat", "lon"), coords=coords, name="extreme_events")
        mask = Field(
            np.ones((NY, NX), bool),
            ("lat", "lon"),
            coords={"lat": coords["lat"], "lon": coords["lon"]},
            name="mask",
        )
        kw = dict(
            R_fill=2, T_fill=0, area_filter_quartile=0.0, allow_merging=True,
            overlap_threshold=0.3, quiet=True, regional_mode=True, coordinate_units="degrees",
        )
        tr_a = marEx.tracker(da, mask, **kw)
        tr_a.use_scan_march = True
        ev_scan, mg_scan = tr_a.run(return_merges=True)
        tr_b = marEx.tracker(da, mask, **kw)
        tr_b.use_scan_march = False
        ev_step, mg_step = tr_b.run(return_merges=True)
        assert ev_scan.attrs["total_merges"] > 0
        _assert_equal_runs((ev_scan, mg_scan), (ev_step, mg_step))

    def test_no_merge_input_equivalence(self):
        """A field with zero actual merges must also be identical (and the
        scan march must not fabricate ledger rows)."""
        T = 25
        data = np.zeros((T, NY, NX), bool)
        yy, xx = np.mgrid[0:NY, 0:NX]
        for t in range(T):
            for cy, cx in ((12, 30), (36, 120)):
                dx = np.minimum(np.abs(xx - ((cx + 2 * t) % NX)), NX - np.abs(xx - ((cx + 2 * t) % NX)))
                data[t] |= (yy - cy) ** 2 + dx**2 <= 25
        da = Field(data, ("time", "lat", "lon"), coords=_coords(T), name="extreme_events")
        ev_scan, mg_scan, _ = _run(da, True)
        ev_step, mg_step, _ = _run(da, False)
        assert ev_scan.attrs["total_merges"] == 0
        _assert_equal_runs((ev_scan, mg_scan), (ev_step, mg_step))

    def test_capacity_retry_ladder(self, monkeypatch):
        """Force an overflow flag on the first attempt and verify the ladder
        regrows the offending bucket, retries, and still matches the
        per-step march (the FLAG -> regrow -> recompile path)."""
        import jax.numpy as jnp

        from marex_tpu import track as _trackmod
        from marex_tpu.ops import march as _march_mod

        da = merge_dense_field(T=30, n_pairs=4, seed=11)
        _trackmod._SCAN_SIZE_CACHE.clear()

        orig = _march_mod.scan_march
        calls = {"n": 0, "mp": []}

        def flaky(*args, **kwargs):
            sizes = args[7]
            calls["n"] += 1
            calls["mp"].append(sizes.MP)
            out = dict(orig(*args, **kwargs))
            if calls["n"] == 1:
                out["flags"] = jnp.int32(_march_mod.FLAG_MP)
            return out

        monkeypatch.setattr(_trackmod._march, "scan_march", flaky)
        ev_scan, mg_scan, _ = _run(da, True)
        monkeypatch.undo()
        _trackmod._SCAN_SIZE_CACHE.clear()

        assert calls["n"] == 2
        assert calls["mp"][1] > calls["mp"][0]
        ev_step, mg_step, _ = _run(da, False)
        _assert_equal_runs((ev_scan, mg_scan), (ev_step, mg_step))


class TestScanMarchUnstructured:
    """The mesh variant of the scan march must match the per-step device
    march exactly (BFS-hop partitioning, spherical additive components)."""

    @staticmethod
    def _mesh_case(T=40, n_side=28, seed=5):
        from .conftest import make_unstructured_mesh

        lat_c, lon_c, nb, areas = make_unstructured_mesh(n_side=n_side, seed=seed)
        C = len(lat_c)
        data = np.zeros((T, C), bool)
        for t in range(T):
            phase = (t % 20) / 20.0
            sep = (1.0 - min(phase * 2, 1.0)) * 24 + 8
            for band, lonc0 in ((20, 80), (-20, 250)):
                for s in (-sep, sep):
                    lonc = lonc0 + s
                    d = np.abs(lon_c - lonc)
                    data[t] |= (np.abs(lat_c - band) < 14) & (d < 16)
        coords = {
            "time": pd.date_range("2019-01-01", periods=T, freq="D").to_numpy(),
            "lat": ("ncells", lat_c),
            "lon": ("ncells", lon_c),
        }
        da = Field(data, ("time", "ncells"), coords=coords, name="extreme_events")
        mask = Field(
            np.ones(C, bool), ("ncells",),
            coords={"lat": ("ncells", lat_c), "lon": ("ncells", lon_c)}, name="mask",
        )
        nbf = Field(nb, ("nv", "ncells"), name="neighbours")
        caf = Field(areas, ("ncells",), name="cell_areas")
        return da, mask, nbf, caf

    def _run(self, scan: bool, nn: bool, tmp_path):
        da, mask, nbf, caf = self._mesh_case()
        tr = marEx.tracker(
            da, mask, R_fill=1, T_fill=0, area_filter_absolute=1,
            allow_merging=True, nn_partitioning=nn, overlap_threshold=0.3,
            unstructured_grid=True, dimensions={"x": "ncells"},
            coordinates={"x": "lon", "y": "lat"}, coordinate_units="degrees",
            temp_dir=str(tmp_path), neighbours=nbf, cell_areas=caf, quiet=True,
        )
        tr.use_scan_march = scan
        events, merges = tr.run(return_merges=True)
        return events, merges, tr

    @pytest.mark.parametrize("nn", [True, False], ids=["nn", "centroid"])
    def test_unstructured_merge_equivalence(self, nn, tmp_path):
        ev_scan, mg_scan, tr_scan = self._run(True, nn, tmp_path / "a")
        ev_step, mg_step, _ = self._run(False, nn, tmp_path / "b")
        assert ev_scan.attrs["total_merges"] > 0
        assert "march_scan" in tr_scan.dispatch_counts
        _assert_equal_runs((ev_scan, mg_scan), (ev_step, mg_step))


class TestScanMarchBlockwise:
    """Blockwise (streamed) march equality: running the scan march over
    time blocks with carried state must reproduce the monolithic program
    and the per-step march exactly — the correctness core of
    larger-than-memory tracking."""

    @pytest.mark.parametrize("block_T", [7, 16, 25], ids=["b7", "b16", "b25"])
    def test_blockwise_equals_monolithic(self, block_T):
        from marex_tpu import track as _trackmod

        da = merge_dense_field(T=50, n_pairs=4, seed=7)
        _trackmod._SCAN_SIZE_CACHE.clear()
        ev_mono, mg_mono, _ = _run(da, True)

        _trackmod._SCAN_SIZE_CACHE.clear()
        kwargs = dict(R_fill=2, T_fill=0, area_filter_quartile=0.0,
                      allow_merging=True, overlap_threshold=0.3, quiet=True)
        tr = marEx.tracker(da, _mask(), **kwargs)
        tr.use_scan_march = True
        tr.march_block_T = block_T
        ev_blk, mg_blk = tr.run(return_merges=True)
        n_blocks = -(-50 // block_T)
        assert tr.dispatch_counts["march_scan"] >= n_blocks
        assert ev_blk.attrs["total_merges"] > 0
        _assert_equal_runs((ev_blk, mg_blk), (ev_mono, mg_mono))

    def test_blockwise_unstructured(self, tmp_path):
        from marex_tpu import track as _trackmod

        helper = TestScanMarchUnstructured()
        _trackmod._SCAN_SIZE_CACHE.clear()
        ev_mono, mg_mono, _ = helper._run(True, True, tmp_path / "m")

        _trackmod._SCAN_SIZE_CACHE.clear()
        da, mask, nbf, caf = helper._mesh_case()
        tr = marEx.tracker(
            da, mask, R_fill=1, T_fill=0, area_filter_absolute=1,
            allow_merging=True, nn_partitioning=True, overlap_threshold=0.3,
            unstructured_grid=True, dimensions={"x": "ncells"},
            coordinates={"x": "lon", "y": "lat"}, coordinate_units="degrees",
            temp_dir=str(tmp_path / "b"), neighbours=nbf, cell_areas=caf, quiet=True,
        )
        tr.use_scan_march = True
        tr.march_block_T = 13
        ev_blk, mg_blk = tr.run(return_merges=True)
        assert ev_blk.attrs["total_merges"] > 0
        _assert_equal_runs((ev_blk, mg_blk), (ev_mono, mg_mono))


class TestBandedPartition:
    """The row-banded partition (MarchSizes.HC > 0, active at H >= 160)
    must be bit-identical to the per-step march: the band covers every
    child cell and the EDT reads +-win_dyn rows beyond it, so restricting
    the assignment arrays to the band is exact."""

    @staticmethod
    def _tall_field(T=40, n_pairs=4, seed=9, NYT=192, NXT=120):
        data = np.zeros((T, NYT, NXT), bool)
        yy, xx = np.mgrid[0:NYT, 0:NXT]
        rng = np.random.default_rng(seed)
        centers = [(int(rng.integers(NYT // 6, 5 * NYT // 6)), int(rng.integers(0, NXT))) for _ in range(n_pairs)]
        r = 6
        for t in range(T):
            phase = (t % 20) / 20.0
            sep = int((1.0 - min(phase * 2, 1.0)) * 3 * r) + r
            for cy, cx0 in centers:
                for s in (-sep, sep):
                    cx = (cx0 + s) % NXT
                    dx = np.minimum(np.abs(xx - cx), NXT - np.abs(xx - cx))
                    data[t] |= (yy - cy) ** 2 + dx**2 <= r * r
        coords = {
            "time": pd.date_range("2021-01-01", periods=T, freq="D").to_numpy(),
            "lat": np.linspace(-75, 75, NYT),
            "lon": np.linspace(0, 360, NXT, endpoint=False),
        }
        return Field(data, ("time", "lat", "lon"), coords=coords, name="extreme_events")

    @pytest.mark.parametrize("nn", [True, False], ids=["nn", "centroid"])
    def test_tall_grid_equivalence(self, nn):
        da = self._tall_field()
        NYT, NXT = 192, 120
        mask = Field(
            np.ones((NYT, NXT), bool), ("lat", "lon"),
            coords={"lat": np.linspace(-75, 75, NYT), "lon": np.linspace(0, 360, NXT, endpoint=False)},
            name="mask",
        )
        kwargs = dict(R_fill=2, T_fill=0, area_filter_quartile=0.0,
                      allow_merging=True, overlap_threshold=0.3,
                      nn_partitioning=nn, quiet=True)
        tr_scan = marEx.tracker(da, mask, **kwargs)
        tr_scan.use_scan_march = True
        ev_scan, mg_scan = tr_scan.run(return_merges=True)
        tr_step = marEx.tracker(da, mask, **kwargs)
        tr_step.use_scan_march = False
        ev_step, mg_step = tr_step.run(return_merges=True)
        assert ev_scan.attrs["total_merges"] > 0
        _assert_equal_runs((ev_scan, mg_scan), (ev_step, mg_step))

    def test_band_overflow_falls_back_exactly(self, monkeypatch):
        """Children taller than HC take the in-program full-grid branch."""
        import marex_tpu.ops.march as _march

        da = self._tall_field(n_pairs=2)
        # one extra full-height column object every step: band spans the grid
        vals = np.array(da.values, copy=True)
        vals[:, :, 0:3] = True
        vals[:, :, 6:9] = True  # a second column that merges with it via R_fill
        NYT, NXT = 192, 120
        da2 = Field(vals, da.dims, da.coords, name="extreme_events")
        mask = Field(
            np.ones((NYT, NXT), bool), ("lat", "lon"),
            coords={"lat": np.linspace(-75, 75, NYT), "lon": np.linspace(0, 360, NXT, endpoint=False)},
            name="mask",
        )
        kwargs = dict(R_fill=2, T_fill=0, area_filter_quartile=0.0,
                      allow_merging=True, overlap_threshold=0.3,
                      nn_partitioning=True, quiet=True)
        tr_scan = marEx.tracker(da2, mask, **kwargs)
        tr_scan.use_scan_march = True
        ev_scan, mg_scan = tr_scan.run(return_merges=True)
        tr_step = marEx.tracker(da2, mask, **kwargs)
        tr_step.use_scan_march = False
        ev_step, mg_step = tr_step.run(return_merges=True)
        _assert_equal_runs((ev_scan, mg_scan), (ev_step, mg_step))
