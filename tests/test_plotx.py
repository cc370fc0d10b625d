"""plotX tests with the Agg backend (cf. tests/test_plotx.py)."""

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt
import numpy as np
import pandas as pd
import pytest

import marex_tpu as marEx
from marex_tpu.core.field import Coord, Field
from marex_tpu.plotX import GriddedPlotter, PlotConfig, UnstructuredPlotter, specify_grid

from .conftest import make_unstructured_mesh


@pytest.fixture
def gridded_da():
    T, NY, NX = 6, 18, 36
    rng = np.random.default_rng(0)
    return Field(
        rng.standard_normal((T, NY, NX)).astype(np.float32),
        ("time", "lat", "lon"),
        coords={
            "time": pd.date_range("2020-01-01", periods=T, freq="D").to_numpy(),
            "lat": np.linspace(-80, 80, NY),
            "lon": np.linspace(0, 360, NX, endpoint=False),
        },
        name="anoms",
    )


@pytest.fixture
def unstructured_da():
    lat_c, lon_c, nb, areas = make_unstructured_mesh(n_side=10)
    C = len(lat_c)
    rng = np.random.default_rng(1)
    return Field(
        rng.standard_normal((4, C)).astype(np.float32),
        ("time", "ncells"),
        coords={
            "time": pd.date_range("2020-01-01", periods=4, freq="D").to_numpy(),
            "lat": Coord("ncells", lat_c),
            "lon": Coord("ncells", lon_c),
        },
        name="anoms",
    )


class TestAccessor:
    def test_field_has_plotx(self, gridded_da):
        acc = gridded_da.plotX
        plotter = acc()
        assert isinstance(plotter, GriddedPlotter)

    def test_unstructured_detection(self, unstructured_da):
        plotter = unstructured_da.plotX(dimensions={"time": "time", "x": "ncells"})
        assert isinstance(plotter, UnstructuredPlotter)

    def test_specify_grid_override(self, gridded_da):
        specify_grid(grid_type="gridded")
        try:
            plotter = gridded_da.plotX()
            assert isinstance(plotter, GriddedPlotter)
        finally:
            specify_grid(grid_type=None)

    def test_specify_grid_invalid(self):
        with pytest.raises(marEx.ConfigurationError):
            specify_grid(grid_type="hexagonal")


class TestGriddedPlots:
    def test_single_plot(self, gridded_da):
        fig, ax, im = gridded_da.plotX().single_plot(PlotConfig(title="t", issym=True))
        assert fig is not None
        plt.close(fig)

    def test_single_plot_clim(self, gridded_da):
        fig, ax, im = gridded_da.plotX().single_plot(PlotConfig(clim=(-1, 1)))
        lo, hi = im.get_clim()
        assert (lo, hi) == (-1, 1)
        plt.close(fig)

    def test_plot_ids(self, gridded_da):
        ids = gridded_da._replace(data=(np.abs(gridded_da.values) * 3).astype(np.int32))
        fig, ax, im = ids.plotX().single_plot(PlotConfig(plot_IDs=True))
        plt.close(fig)

    def test_multi_plot(self, gridded_da):
        fig, axes = gridded_da.plotX().multi_plot(PlotConfig(), col="time", col_wrap=3)
        assert len(axes) >= 6
        plt.close(fig)

    def test_clim_robust(self):
        data = np.linspace(0, 100, 101)
        lo, hi = GriddedPlotter.clim_robust(data, False, [4, 96])
        assert lo == pytest.approx(4.0) and hi == pytest.approx(96.0)
        lo, hi = GriddedPlotter.clim_robust(data, True, [4, 96])
        assert lo == -hi


class TestUnstructuredPlots:
    def test_single_plot_tripcolor(self, unstructured_da):
        plotter = unstructured_da.plotX(dimensions={"time": "time", "x": "ncells"})
        fig, ax, im = plotter.single_plot(PlotConfig(title="mesh"))
        plt.close(fig)

    def test_missing_coords_raise(self):
        da = Field(np.zeros((3, 10), np.float32), ("time", "ncells"))
        with pytest.raises(marEx.VisualisationError):
            da.plotX(dimensions={"time": "time", "x": "ncells"})


class TestAnimation:
    def test_animate_produces_file(self, gridded_da, tmp_path):
        plotter = gridded_da.plotX()
        out = plotter.animate(PlotConfig(framerate=5, show_colorbar=False), plot_dir=str(tmp_path), file_name="anim")
        assert out is not None
        import os

        assert os.path.exists(out)
        assert out.endswith((".mp4", ".gif"))


class TestPlotConfig:
    def test_defaults(self):
        cfg = PlotConfig()
        assert cfg.cperc == [4, 96]
        assert cfg.dimensions == {"time": "time", "y": "lat", "x": "lon"}
        assert cfg.coordinates == {"time": "time", "y": "lat", "x": "lon"}
        assert cfg.show_colorbar and cfg.grid_lines and not cfg.grid_labels
        assert cfg.extend == "both" and cfg.framerate == 10

    def test_plot_ids_disables_colorbar(self):
        cfg = PlotConfig(plot_IDs=True, show_colorbar=True)
        assert cfg.show_colorbar is False

    def test_custom_fields_preserved(self):
        cfg = PlotConfig(
            title="T", var_units="degC", issym=True, cperc=[2, 98],
            clim=(-3.0, 3.0), extend="max", framerate=24,
            dimensions={"time": "t", "y": "row", "x": "col"},
        )
        assert cfg.title == "T" and cfg.var_units == "degC"
        assert cfg.cperc == [2, 98] and cfg.clim == (-3.0, 3.0)
        assert cfg.extend == "max" and cfg.framerate == 24
        assert cfg.dimensions["y"] == "row"

    def test_default_projection_robinson_when_cartopy(self):
        from marex_tpu._dependencies import has_dependency

        cfg = PlotConfig()
        if has_dependency("cartopy"):
            import cartopy.crs as ccrs

            assert isinstance(cfg.projection, ccrs.Robinson)
        else:
            assert cfg.projection is None


class TestPlotterHelpers:
    def test_clim_robust_ignores_nan(self):
        data = np.concatenate([np.linspace(0, 100, 101), [np.nan, np.inf, -np.inf]])
        lo, hi = GriddedPlotter.clim_robust(data, False, [4, 96])
        assert lo == pytest.approx(4.0) and hi == pytest.approx(96.0)

    def test_clim_robust_empty_and_all_nan(self):
        assert GriddedPlotter.clim_robust(np.array([]), False, [4, 96]) == (0.0, 1.0)
        assert GriddedPlotter.clim_robust(np.full(5, np.nan), True, [4, 96]) == (0.0, 1.0)

    def test_clim_robust_zero_percentile(self):
        data = np.linspace(-50, 100, 151)
        lo, hi = GriddedPlotter.clim_robust(data, False, [0, 100])
        assert lo == pytest.approx(-50.0) and hi == pytest.approx(100.0)

    def test_setup_id_plot_params(self, gridded_da):
        ids = gridded_da._replace(data=(np.abs(gridded_da.values) * 5).astype(np.int32))
        plotter = ids.plotX()
        cmap, norm, label = plotter.setup_id_plot_params(None)
        assert label == "ID"
        max_id = int(ids.values.max())
        # BoundaryNorm bins: one per integer ID, edges at k + 0.5
        assert norm.boundaries[0] == pytest.approx(0.5)
        assert len(norm.boundaries) == max_id + 1
        # seeded -> deterministic colors across calls
        cmap2, _, _ = plotter.setup_id_plot_params(None)
        assert np.allclose(cmap.colors, cmap2.colors)

    def test_setup_id_plot_params_custom_cmap(self, gridded_da):
        from matplotlib.colors import ListedColormap

        ids = gridded_da._replace(data=np.ones(gridded_da.shape, np.int32))
        custom = ListedColormap([[1, 0, 0], [0, 1, 0]])
        cmap, norm, _ = ids.plotX().setup_id_plot_params(custom)
        assert cmap is custom

    def test_symmetric_default_cmap(self, gridded_da):
        plotter = gridded_da.plotX()
        cmap, norm, clim, _, _ = plotter._setup_common_params(PlotConfig(issym=True))
        assert cmap == "RdBu_r"
        assert clim[0] == pytest.approx(-clim[1])

    def test_plot_ids_masks_nonpositive(self, gridded_da):
        ids = gridded_da._replace(data=np.arange(gridded_da.size, dtype=np.int32).reshape(gridded_da.shape) % 4 - 1)
        plotter = ids.plotX()
        plotter._setup_common_params(PlotConfig(plot_IDs=True))
        vals = np.asarray(plotter.da.values, dtype=float)
        assert np.all(np.isnan(vals[np.asarray(ids.values) <= 0]))

    def test_get_title_formats_dates(self, gridded_da):
        plotter = gridded_da.plotX()
        assert plotter._get_title(0, "time") == "2020-01-01"
        assert plotter._get_title(3, "time") == "2020-01-04"

    def test_get_title_non_time_col(self, gridded_da):
        plotter = gridded_da.plotX()
        title = plotter._get_title(0, "lat")
        assert title.startswith("lat=")

    def test_wrap_lon_closes_seam(self, gridded_da):
        plotter = gridded_da.plotX()
        data = np.asarray(gridded_da.isel(time=0).values)
        lon = np.asarray(gridded_da.coords["lon"].values)
        wdata, wlon = plotter.wrap_lon(data, lon)
        assert wdata.shape[1] == data.shape[1] + 1
        assert wlon[-1] == pytest.approx(lon[0] + 360.0)
        np.testing.assert_array_equal(wdata[:, -1], data[:, 0])


class TestAccessorDepth:
    def test_accessor_convenience_methods(self, gridded_da):
        fig, ax, im = gridded_da.plotX.single_plot(PlotConfig(show_colorbar=False))
        plt.close(fig)
        fig, axes = gridded_da.plotX.multi_plot(PlotConfig(show_colorbar=False), col="time", col_wrap=3)
        plt.close(fig)

    def test_override_warns_on_mismatch(self, unstructured_da):
        specify_grid(grid_type="gridded")
        try:
            with pytest.warns(UserWarning, match="differs from detected"):
                plotter = unstructured_da.plotX(dimensions={"time": "time", "x": "ncells"})
            assert isinstance(plotter, GriddedPlotter)
        finally:
            specify_grid(grid_type=None)

    def test_specify_grid_with_path_objects(self, unstructured_da, tmp_path):
        from pathlib import Path

        from marex_tpu import plotX as px

        specify_grid(grid_type="unstructured", fpath_tgrid=Path(tmp_path / "tgrid.zarr"), fpath_ckdtree=Path(tmp_path / "ckdt"))
        try:
            assert isinstance(px._fpath_tgrid, str)
            plotter = unstructured_da.plotX(dimensions={"time": "time", "x": "ncells"})
            assert plotter.fpath_tgrid == str(tmp_path / "tgrid.zarr")
            assert plotter.fpath_ckdtree == str(tmp_path / "ckdt")
        finally:
            specify_grid()

    def test_specify_grid_none_resets(self):
        from marex_tpu import plotX as px

        specify_grid(grid_type="unstructured", fpath_tgrid="/x", fpath_ckdtree="/y")
        specify_grid()
        assert px._grid_type is None and px._fpath_tgrid is None and px._fpath_ckdtree is None

    def test_validation_error_context(self, gridded_da):
        with pytest.raises(marEx.VisualisationError) as ei:
            GriddedPlotter(gridded_da, dimensions={"time": "time", "y": "row", "x": "col"})
        err = ei.value
        assert err.context["missing_dimensions"]
        assert "lat" in err.context["available_dimensions"]
        assert err.suggestions

    def test_missing_coordinates_error(self):
        da = Field(
            np.zeros((2, 4, 8), np.float32),
            ("time", "lat", "lon"),
            coords={"lat": np.arange(4.0)},  # no lon coord
            name="x",
        )
        with pytest.raises(marEx.VisualisationError, match="Missing required coordinates"):
            GriddedPlotter(da)


class TestUnstructuredDepth:
    def test_ckdtree_regrid_path(self, unstructured_da):
        plotter = unstructured_da.plotX(dimensions={"time": "time", "x": "ncells"})
        plotter.specify_grid(fpath_ckdtree="unused-key")  # any non-None switches to regrid
        fig, ax, im = plotter.single_plot(PlotConfig(show_colorbar=False))
        from matplotlib.collections import QuadMesh

        assert isinstance(im, QuadMesh)  # pcolormesh, not tripcolor
        plt.close(fig)

    def test_tgrid_file_triangulation(self, tmp_path):
        """Explicit tgrid store: 4 vertices / 2 triangles, ICON-style
        1-based vertex_of_cell with radian clon/clat."""
        from marex_tpu.core.field import FieldSet
        from marex_tpu.io.zarr_lite import to_zarr
        from marex_tpu.plotX import unstructured as unstr

        verts_lon = np.deg2rad(np.array([0.0, 10.0, 10.0, 0.0]))
        verts_lat = np.deg2rad(np.array([0.0, 0.0, 10.0, 10.0]))
        voc = np.array([[1, 2, 3], [1, 3, 4]]).T  # (3, ncells), 1-based
        tgrid = FieldSet(
            {
                "clon": Field(verts_lon, ("vertex",), name="clon"),
                "clat": Field(verts_lat, ("vertex",), name="clat"),
                "vertex_of_cell": Field(voc.astype(np.int32), ("nv", "ncells"), name="vertex_of_cell"),
            }
        )
        path = str(tmp_path / "tgrid.zarr")
        to_zarr(tgrid, path)

        cell_lon = np.array([6.6, 3.3])
        cell_lat = np.array([3.3, 6.6])
        da = Field(
            np.array([[1.0, 2.0]], np.float32),
            ("time", "ncells"),
            coords={
                "time": pd.date_range("2020-01-01", periods=1, freq="D").to_numpy(),
                "lat": Coord("ncells", cell_lat),
                "lon": Coord("ncells", cell_lon),
            },
            name="anoms",
        )
        unstr._GRID_CACHE.clear()
        plotter = da.plotX(dimensions={"time": "time", "x": "ncells"})
        plotter.specify_grid(fpath_tgrid=path)
        fig, ax, im = plotter.single_plot(PlotConfig(show_colorbar=False))
        plt.close(fig)
        tri = unstr._GRID_CACHE[("tgrid", str(path))]
        assert tri.triangles.shape == (2, 3)
        np.testing.assert_array_equal(tri.triangles, voc.T - 1)
        np.testing.assert_allclose(tri.x, np.rad2deg(verts_lon))

    def test_delaunay_seam_mask(self, unstructured_da):
        from marex_tpu.plotX import unstructured as unstr

        unstr._GRID_CACHE.clear()
        plotter = unstructured_da.plotX(dimensions={"time": "time", "x": "ncells"})
        lon = np.asarray(unstructured_da.coords["lon"].values, dtype=float)
        lat = np.asarray(unstructured_da.coords["lat"].values, dtype=float)
        tri = plotter._triangulation(lon, lat)
        if tri.mask is not None:
            spans = np.ptp(lon[tri.triangles], axis=1)
            assert np.all(spans[tri.mask] > 180.0)

    def test_grid_cache_reused(self, unstructured_da):
        from marex_tpu.plotX import unstructured as unstr

        unstr._GRID_CACHE.clear()
        plotter = unstructured_da.plotX(dimensions={"time": "time", "x": "ncells"})
        lon = np.asarray(unstructured_da.coords["lon"].values, dtype=float)
        lat = np.asarray(unstructured_da.coords["lat"].values, dtype=float)
        t1 = plotter._triangulation(lon, lat)
        t2 = plotter._triangulation(lon, lat)
        assert t1 is t2

    def test_shape_mismatch_raises(self, unstructured_da):
        plotter = unstructured_da.plotX(dimensions={"time": "time", "x": "ncells"})
        # the Field constructor itself now rejects coords that conflict with
        # the data's dim sizes, so attach the full-length lon/lat over a
        # foreign dim to exercise the plotter's own size check
        from marex_tpu.core.field import Coord

        plotter.da = Field(
            np.zeros((4, 7), np.float32),
            ("time", "ncells"),
            coords={
                "lon": Coord("cells_orig", unstructured_da.coords["lon"].values),
                "lat": Coord("cells_orig", unstructured_da.coords["lat"].values),
            },
            name="bad",
        )
        import matplotlib.pyplot as mplt

        fig, ax = mplt.subplots()
        with pytest.raises(marEx.VisualisationError, match="1-D cell data"):
            plotter.plot(ax, "viridis")
        mplt.close(fig)


class TestAnimationDepth:
    def test_animate_gif_fallback(self, gridded_da, tmp_path, monkeypatch):
        """Without ffmpeg the PIL path must produce an animated GIF."""
        import shutil as _shutil

        import marex_tpu.plotX.base as base_mod

        monkeypatch.setattr(base_mod.shutil, "which", lambda name: None)
        plotter = gridded_da.isel(time=slice(0, 3)).plotX()
        out = plotter.animate(
            PlotConfig(framerate=5, show_colorbar=False, frame_batch_size=2),
            plot_dir=str(tmp_path),
            file_name="fallback",
        )
        assert out.endswith(".gif")
        from PIL import Image

        with Image.open(out) as img:
            assert getattr(img, "n_frames", 1) == 3

    def test_animate_requires_time_dim(self, gridded_da):
        plotter = gridded_da.isel(time=0).plotX()
        with pytest.raises(marEx.VisualisationError, match="time dimension"):
            plotter.animate(PlotConfig())

    def test_animate_default_name_from_field(self, gridded_da, tmp_path):
        plotter = gridded_da.isel(time=slice(0, 2)).plotX()
        out = plotter.animate(PlotConfig(framerate=2, show_colorbar=False), plot_dir=str(tmp_path))
        import os

        assert os.path.basename(out).startswith("anoms")


class TestCustomDimensions:
    """Plotting with renamed dims/coords (reference tests/test_plotx.py
    TestCustomDimensions)."""

    @pytest.fixture
    def gridded_custom(self):
        T, NY, NX = 4, 14, 28
        rng = np.random.default_rng(7)
        return Field(
            rng.standard_normal((T, NY, NX)).astype(np.float32),
            ("t", "yy", "xx"),
            coords={
                "t": pd.date_range("2020-01-01", periods=T, freq="D").to_numpy(),
                "latitude": Coord("yy", np.linspace(-70, 70, NY)),
                "longitude": Coord("xx", np.linspace(0, 360, NX, endpoint=False)),
            },
            name="anoms",
        )

    def test_detection_with_custom_dims(self, gridded_custom):
        from marex_tpu.plotX import _detect_grid_type

        dims = {"time": "t", "y": "yy", "x": "xx"}
        assert _detect_grid_type(gridded_custom, dims) == "gridded"
        # without the mapping the y dim is absent -> unstructured fallback
        assert _detect_grid_type(gridded_custom) == "unstructured"

    def test_single_plot_custom_dims(self, gridded_custom):
        dims = {"time": "t", "y": "yy", "x": "xx"}
        coords = {"time": "t", "y": "latitude", "x": "longitude"}
        plotter = gridded_custom.plotX(dimensions=dims, coordinates=coords)
        assert isinstance(plotter, GriddedPlotter)
        fig, ax, im = plotter.single_plot(PlotConfig(show_colorbar=False))
        assert fig is not None
        plt.close(fig)

    def test_unstructured_custom_cell_dim(self):
        lat_c, lon_c, nb, areas = make_unstructured_mesh(n_side=8)
        C = len(lat_c)
        rng = np.random.default_rng(8)
        da = Field(
            rng.standard_normal((3, C)).astype(np.float32),
            ("t", "cell"),
            coords={
                "t": pd.date_range("2020-01-01", periods=3, freq="D").to_numpy(),
                "lat": Coord("cell", lat_c),
                "lon": Coord("cell", lon_c),
            },
            name="anoms",
        )
        dims = {"time": "t", "x": "cell"}
        coords = {"time": "t", "y": "lat", "x": "lon"}
        plotter = da.plotX(dimensions=dims, coordinates=coords)
        assert isinstance(plotter, UnstructuredPlotter)
        fig, ax, im = plotter.single_plot(PlotConfig(show_colorbar=False))
        plt.close(fig)


class TestXarrayAccessor:
    """The plotX accessor registers on xarray DataArrays too (reference
    test_xarray_accessor_registration)."""

    def test_dataarray_accessor(self, gridded_da):
        xr = pytest.importorskip("xarray")
        da = xr.DataArray(
            np.asarray(gridded_da.values),
            dims=("time", "lat", "lon"),
            coords={
                "time": gridded_da.coords["time"].values,
                "lat": gridded_da.coords["lat"].values,
                "lon": gridded_da.coords["lon"].values,
            },
            name="anoms",
        )
        assert hasattr(da, "plotX")
        plotter = da.plotX()
        assert isinstance(plotter, GriddedPlotter)
        fig, ax, im = plotter.single_plot(PlotConfig(show_colorbar=False))
        plt.close(fig)

    def test_dataset_fields_plot(self, gridded_da):
        # plot directly from a pipeline-style FieldSet member
        from marex_tpu.core.field import FieldSet

        ds = FieldSet({"anoms": gridded_da})
        fig, ax, im = ds["anoms"].plotX.single_plot(PlotConfig(show_colorbar=False))
        plt.close(fig)


class TestMultiPlotDepth:
    def test_multi_plot_col_wrap_and_grid(self, gridded_da):
        plotter = gridded_da.plotX()
        fig, axes = plotter.multi_plot(PlotConfig(show_colorbar=False), col="time", col_wrap=3)
        n = gridded_da.sizes["time"]
        assert np.asarray(axes).size >= n
        plt.close(fig)

    def test_multi_plot_shared_clim(self, gridded_da):
        # one symmetric clim across panels: the panel images share vmin/vmax
        plotter = gridded_da.plotX()
        fig, axes = plotter.multi_plot(PlotConfig(show_colorbar=False, issym=True), col="time", col_wrap=3)
        ims = [im for ax in np.asarray(axes).ravel() for im in ax.get_images()]
        if not ims:  # pcolormesh path stores QuadMesh in collections
            ims = [c for ax in np.asarray(axes).ravel() for c in ax.collections]
        clims = {tuple(np.round(np.asarray(im.get_clim(), dtype=float), 6)) for im in ims}
        assert len(clims) == 1
        plt.close(fig)
