"""plotX grid-cache, file-loader, animation-batching and dependency-gate
tests (reference scope: tests/test_plotx.py TestUnstructuredUtilityFunctions,
TestPlotXImportErrorHandling, animation batching of plotX/base.py:479-524)."""

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt
import numpy as np
import pandas as pd
import pytest

from marex_tpu.core.field import Coord, Field, FieldSet
from marex_tpu.exceptions import DataValidationError, DependencyError, VisualisationError
from marex_tpu.io import zarr_lite
from marex_tpu.plotX import PlotConfig, UnstructuredPlotter, clear_cache
from marex_tpu.plotX import unstructured as unstr_mod
from marex_tpu.plotX.base import PlotterBase, _check_plotting_dependencies

from .conftest import make_unstructured_mesh


@pytest.fixture
def cells_da():
    lat_c, lon_c, nb, areas = make_unstructured_mesh(n_side=8)
    C = len(lat_c)
    rng = np.random.default_rng(3)
    return Field(
        rng.standard_normal((5, C)).astype(np.float32),
        ("time", "ncells"),
        coords={
            "time": pd.date_range("2021-01-01", periods=5, freq="D").to_numpy(),
            "lat": Coord("ncells", lat_c),
            "lon": Coord("ncells", lon_c),
        },
        name="anoms",
    )


def _write_tgrid(path, n_vert=6, n_tri=4, radians=True):
    rng = np.random.default_rng(0)
    vlon = rng.uniform(-170, 170, n_vert)
    vlat = rng.uniform(-80, 80, n_vert)
    voc = np.stack([np.arange(n_tri), (np.arange(n_tri) + 1) % n_vert, (np.arange(n_tri) + 2) % n_vert]) + 1
    if radians:
        fs = FieldSet(
            {
                "clon": Field(np.deg2rad(vlon), ("vertex",), name="clon"),
                "clat": Field(np.deg2rad(vlat), ("vertex",), name="clat"),
                "vertex_of_cell": Field(voc.astype(np.int32), ("nv", "cell"), name="vertex_of_cell"),
            }
        )
    else:
        fs = FieldSet(
            {
                "vlon": Field(vlon, ("vertex",), name="vlon"),
                "vlat": Field(vlat, ("vertex",), name="vlat"),
                "vertex_of_cell": Field(voc.astype(np.int32), ("nv", "cell"), name="vertex_of_cell"),
            }
        )
    zarr_lite.to_zarr(fs, str(path))
    return vlon, vlat


class TestGridCache:
    def test_clear_cache_empties_store(self, cells_da):
        clear_cache()
        p = UnstructuredPlotter(cells_da)
        lon = np.asarray(cells_da.coords["lon"].values, float)
        lat = np.asarray(cells_da.coords["lat"].values, float)
        p._triangulation(lon, lat)
        assert len(unstr_mod._GRID_CACHE) > 0
        clear_cache()
        assert len(unstr_mod._GRID_CACHE) == 0

    def test_delaunay_triangulation_cached_by_identity(self, cells_da):
        clear_cache()
        p = UnstructuredPlotter(cells_da)
        lon = np.asarray(cells_da.coords["lon"].values, float)
        lat = np.asarray(cells_da.coords["lat"].values, float)
        t1 = p._triangulation(lon, lat)
        t2 = p._triangulation(lon, lat)
        assert t1 is t2

    def test_kdtree_regrid_cached(self, cells_da):
        clear_cache()
        p = UnstructuredPlotter(cells_da)
        lon = np.asarray(cells_da.coords["lon"].values, float)
        lat = np.asarray(cells_da.coords["lat"].values, float)
        vals = np.arange(len(lon), dtype=float)
        p._kdtree_regrid(lon, lat, vals, res=10.0)
        key = ("kdt", len(lon), 10.0)
        assert key in unstr_mod._GRID_CACHE
        cached = unstr_mod._GRID_CACHE[key]
        p._kdtree_regrid(lon, lat, vals, res=10.0)
        assert unstr_mod._GRID_CACHE[key] is cached


class TestLoadTriangulation:
    def test_load_radian_store(self, tmp_path):
        clear_cache()
        store = tmp_path / "tgrid.zarr"
        vlon, vlat = _write_tgrid(store, radians=True)
        tri = unstr_mod._load_triangulation(store)
        np.testing.assert_allclose(tri.x, vlon, rtol=1e-6)
        np.testing.assert_allclose(tri.y, vlat, rtol=1e-6)
        # second load returns the cached object without touching disk
        assert unstr_mod._load_triangulation(store) is tri

    def test_load_degree_store(self, tmp_path):
        clear_cache()
        store = tmp_path / "tgrid_deg.zarr"
        vlon, vlat = _write_tgrid(store, radians=False)
        tri = unstr_mod._load_triangulation(store)
        np.testing.assert_allclose(tri.x, vlon, rtol=1e-6)

    def test_missing_variables_raise_with_inventory(self, tmp_path):
        clear_cache()
        store = tmp_path / "bad.zarr"
        fs = FieldSet({"clon": Field(np.zeros(4), ("vertex",), name="clon")})
        zarr_lite.to_zarr(fs, str(store))
        with pytest.raises(DataValidationError) as ei:
            unstr_mod._load_triangulation(store)
        err = ei.value
        assert "vertex_of_cell" in err.context["required_vars"]
        assert "clon" in err.context["available_vars"]
        assert err.suggestions


class TestLoadCkdtree:
    def _write_ckdtree(self, root, res, nlon=12, nlat=6, n_cells=128):
        rng = np.random.default_rng(5)
        lon = np.linspace(-180, 180, nlon, endpoint=False)
        lat = np.linspace(-90, 90, nlat)
        idx = rng.integers(0, n_cells, size=(nlat, nlon)).astype(np.int64)
        fs = FieldSet(
            {
                "ickdtree_c": Field(idx, ("lat", "lon"), name="ickdtree_c"),
                "lon": Field(lon, ("lon",), name="lon"),
                "lat": Field(lat, ("lat",), name="lat"),
            }
        )
        zarr_lite.to_zarr(fs, str(root / f"res{res:3.2f}.zarr"))
        return lon, lat, idx

    def test_missing_store_raises(self, tmp_path):
        clear_cache()
        with pytest.raises(DataValidationError) as ei:
            unstr_mod._load_ckdtree(tmp_path, 1.0)
        assert "res1.00.zarr" in ei.value.context["expected_file"]
        assert ei.value.context["resolution"] == 1.0

    def test_load_and_cache(self, tmp_path):
        clear_cache()
        lon, lat, idx = self._write_ckdtree(tmp_path, 1.0)
        entry = unstr_mod._load_ckdtree(tmp_path, 1.0)
        np.testing.assert_array_equal(entry["indices"], idx)
        np.testing.assert_allclose(entry["lon"], lon)
        assert unstr_mod._load_ckdtree(tmp_path, 1.0) is entry

    def test_regrid_uses_precomputed_indices(self, tmp_path, cells_da):
        clear_cache()
        C = cells_da.sizes["ncells"]
        lonr, latr, idx = self._write_ckdtree(tmp_path, 1.0, n_cells=C)
        p = UnstructuredPlotter(cells_da)
        p.specify_grid(fpath_ckdtree=str(tmp_path))
        vals = np.arange(C, dtype=float)
        glon, glat, grid = p._kdtree_regrid(
            np.asarray(cells_da.coords["lon"].values, float),
            np.asarray(cells_da.coords["lat"].values, float),
            vals,
            res=1.0,
        )
        assert grid.shape == (len(latr), len(lonr))
        np.testing.assert_array_equal(grid, vals[idx])

    def test_plot_via_ckdtree_file(self, tmp_path, cells_da):
        clear_cache()
        C = cells_da.sizes["ncells"]
        self._write_ckdtree(tmp_path, 1.0, n_cells=C)
        p = UnstructuredPlotter(cells_da)
        p.specify_grid(fpath_ckdtree=str(tmp_path))
        fig, ax, im = p.single_plot(PlotConfig(show_colorbar=False))
        assert im is not None
        plt.close(fig)


class TestAnimationBatching:
    def test_frame_batch_size_honoured(self, cells_da, tmp_path, monkeypatch):
        """Each batch maps one list of payloads; with batch=2 and T=5 the
        render task must be invoked 5 times across 3 batches."""
        import marex_tpu.plotX.base as base_mod

        calls = []
        real = base_mod._render_frame_task

        def counting(payload):
            calls.append(payload[-1])
            return real(payload)

        monkeypatch.setattr(base_mod, "_render_frame_task", counting)
        # force the serial path so the monkeypatched counter is observable
        monkeypatch.setattr(base_mod.os, "cpu_count", lambda: 1)
        monkeypatch.setattr(base_mod.shutil, "which", lambda name: None)  # GIF path

        p = UnstructuredPlotter(cells_da)
        cfg = PlotConfig(show_colorbar=False)
        cfg.frame_batch_size = 2
        out = p.animate(cfg, plot_dir=tmp_path, file_name="anim_batch")
        assert len(calls) == cells_da.sizes["time"]
        assert out is not None

    def test_pool_failure_falls_back_to_serial(self, cells_da, tmp_path, monkeypatch):
        """A pool whose map() raises (e.g. unpicklable payload) must degrade
        to the serial renderer, not fail the animation."""
        import marex_tpu.plotX.base as base_mod

        class BrokenPool:
            def map(self, fn, payloads):
                raise RuntimeError("cannot pickle")

            def terminate(self):
                pass

            def close(self):
                pass

            def join(self):
                pass

        class Ctx:
            def Pool(self, processes):
                return BrokenPool()

        import multiprocessing as mp

        monkeypatch.setattr(base_mod.os, "cpu_count", lambda: 4)
        monkeypatch.setattr(mp, "get_context", lambda kind: Ctx())
        monkeypatch.setattr(base_mod.shutil, "which", lambda name: None)
        p = UnstructuredPlotter(cells_da.isel(time=slice(0, 2)))
        out = p.animate(PlotConfig(show_colorbar=False), plot_dir=tmp_path, file_name="anim_fb")
        assert out is not None

    def test_missing_time_dim_raises(self, cells_da, tmp_path):
        p = UnstructuredPlotter(cells_da.isel(time=0))
        with pytest.raises(VisualisationError):
            p.animate(PlotConfig(), plot_dir=tmp_path)


class TestDependencyGate:
    def test_check_plotting_dependencies_passes(self):
        _check_plotting_dependencies()  # matplotlib present in this env

    def test_check_plotting_dependencies_missing(self, monkeypatch):
        from marex_tpu import _dependencies

        real = _dependencies.has_dependency
        monkeypatch.setattr(_dependencies, "has_dependency", lambda name: False if name == "matplotlib" else real(name))
        with pytest.raises(DependencyError):
            _check_plotting_dependencies()


class TestPlotterBaseContracts:
    def test_abstract_plot_raises(self, cells_da):
        b = PlotterBase(cells_da, {"time": "time", "x": "ncells"}, {"time": "time", "x": "lon", "y": "lat"})
        with pytest.raises(NotImplementedError):
            b.plot(None, None)

    def test_get_title_missing_coord_raises_keyerror(self, cells_da):
        # parity: the reference's _get_title indexes self.da[col_name]
        # directly and KeyErrors on an unknown column (plotX/base.py:321-329)
        p = UnstructuredPlotter(cells_da)
        with pytest.raises(KeyError):
            p._get_title(0, "not_a_coord")
