"""plotX rendering-contract tests: ID-colormap determinism, norm/clim/extend
precedence in _setup_common_params, animation with centroid overlays, custom
norm passthrough, and multi-plot title generation — the rendering semantics
the reference pins in tests/test_plotx.py TestPlotterBase /
TestGriddedPlotterCoverage."""

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt
import numpy as np
import pandas as pd
import pytest

from marex_tpu.core.field import Field
from marex_tpu.plotX import GriddedPlotter, PlotConfig

DIMS = {"time": "time", "y": "lat", "x": "lon"}


@pytest.fixture
def grid_da():
    rng = np.random.default_rng(7)
    T, H, W = 5, 12, 24
    return Field(
        rng.standard_normal((T, H, W)).astype(np.float32),
        ("time", "lat", "lon"),
        {
            "time": pd.date_range("2022-06-01", periods=T, freq="D").to_numpy(),
            "lat": np.linspace(-60, 60, H),
            "lon": np.linspace(0, 360, W, endpoint=False),
        },
        name="anoms",
    )


@pytest.fixture
def id_da(grid_da):
    ids = np.zeros(grid_da.shape, np.int32)
    ids[:, 2:5, 3:8] = 1
    ids[:, 7:10, 12:18] = 2
    ids[2:, 2:5, 18:22] = 3
    return Field(ids, grid_da.dims, dict(grid_da.coords), name="ID_field")


class TestIDColormap:
    def test_seeded_42_colormap_deterministic(self, id_da):
        """The categorical ID colormap must be the reference's seeded-42
        random map — identical colors across plotters and processes."""
        p1 = GriddedPlotter(id_da, DIMS, DIMS)
        p2 = GriddedPlotter(id_da, DIMS, DIMS)
        cmap1, norm1, units1 = p1.setup_id_plot_params(None)
        cmap2, _, _ = p2.setup_id_plot_params(None)
        np.testing.assert_array_equal(np.asarray(cmap1.colors), np.asarray(cmap2.colors))
        expected = np.random.default_rng(42).random((3, 3))
        np.testing.assert_allclose(np.asarray(cmap1.colors), expected)
        assert units1 == "ID"

    def test_boundary_norm_covers_every_id(self, id_da):
        p = GriddedPlotter(id_da, DIMS, DIMS)
        cmap, norm, _ = p.setup_id_plot_params(None)
        assert norm(1) != norm(2) != norm(3)
        assert norm.boundaries[0] == pytest.approx(0.5)
        assert norm.boundaries[-1] == pytest.approx(3.5)

    def test_custom_cmap_respected(self, id_da):
        from matplotlib.colors import ListedColormap

        custom = ListedColormap([[1, 0, 0], [0, 1, 0], [0, 0, 1]])
        p = GriddedPlotter(id_da, DIMS, DIMS)
        cmap, _, _ = p.setup_id_plot_params(custom)
        assert cmap is custom

    def test_plot_ids_masks_background_and_disables_colorbar(self, id_da):
        cfg = PlotConfig(plot_IDs=True)
        assert cfg.show_colorbar is False
        p = GriddedPlotter(id_da, DIMS, DIMS)
        p._setup_common_params(cfg)
        # background (0) must have been masked to NaN for rendering
        assert np.isnan(np.asarray(p.da.values, float)).any()


class TestCommonParamPrecedence:
    def test_explicit_clim_wins_over_robust(self, grid_da):
        p = GriddedPlotter(grid_da, DIMS, DIMS)
        cmap, norm, clim, units, extend = p._setup_common_params(PlotConfig(clim=(-1.0, 2.0)))
        assert clim == (-1.0, 2.0)

    def test_custom_norm_suppresses_clim(self, grid_da):
        from matplotlib.colors import Normalize

        mynorm = Normalize(vmin=-3, vmax=3)
        p = GriddedPlotter(grid_da, DIMS, DIMS)
        cmap, norm, clim, units, extend = p._setup_common_params(PlotConfig(norm=mynorm))
        assert norm is mynorm
        assert clim is None

    def test_symmetric_default_cmap_and_limits(self, grid_da):
        p = GriddedPlotter(grid_da, DIMS, DIMS)
        cmap, norm, clim, units, extend = p._setup_common_params(PlotConfig(issym=True))
        assert cmap == "RdBu_r"
        assert clim[0] == pytest.approx(-clim[1])

    def test_extend_and_units_passthrough(self, grid_da):
        p = GriddedPlotter(grid_da, DIMS, DIMS)
        _, _, _, units, extend = p._setup_common_params(PlotConfig(var_units="degC", extend="max"))
        assert units == "degC"
        assert extend == "max"

    def test_cperc_changes_robust_limits(self, grid_da):
        p1 = GriddedPlotter(grid_da, DIMS, DIMS)
        _, _, clim_wide, _, _ = p1._setup_common_params(PlotConfig(cperc=[1, 99]))
        p2 = GriddedPlotter(grid_da, DIMS, DIMS)
        _, _, clim_narrow, _, _ = p2._setup_common_params(PlotConfig(cperc=[25, 75]))
        assert clim_wide[1] > clim_narrow[1]
        assert clim_wide[0] < clim_narrow[0]


class TestRenderingPaths:
    def test_single_plot_id_field_renders(self, id_da):
        p = GriddedPlotter(id_da, DIMS, DIMS)
        fig, ax, im = p.single_plot(PlotConfig(plot_IDs=True))
        assert im is not None
        plt.close(fig)

    def test_multi_plot_panel_count_and_titles(self, grid_da):
        p = GriddedPlotter(grid_da, DIMS, DIMS)
        fig, axes = p.multi_plot(PlotConfig(show_colorbar=False), col="time", col_wrap=2)
        flat = np.asarray(axes).ravel()
        drawn = [a for a in flat if a.has_data()]
        assert len(drawn) == grid_da.sizes["time"]
        assert "2022-06-01" in drawn[0].get_title()
        plt.close(fig)

    def test_single_plot_into_existing_axis(self, grid_da):
        fig, ax = plt.subplots()
        p = GriddedPlotter(grid_da, DIMS, DIMS)
        fig2, ax2, im = p.single_plot(PlotConfig(show_colorbar=False), ax=ax)
        assert ax2 is ax
        assert fig2 is fig
        plt.close(fig)

    def test_animate_with_centroids(self, id_da, tmp_path, monkeypatch):
        import marex_tpu.plotX.base as base_mod

        monkeypatch.setattr(base_mod.os, "cpu_count", lambda: 1)
        monkeypatch.setattr(base_mod.shutil, "which", lambda name: None)  # GIF path
        T = id_da.sizes["time"]
        cents = Field(
            np.tile(np.array([10.0, 120.0], np.float32), (T, 1)),
            ("time", "component"),
            {"time": id_da.coords["time"].values},
            name="centroid",
        )
        p = GriddedPlotter(id_da, DIMS, DIMS)
        out = p.animate(PlotConfig(plot_IDs=True), plot_dir=tmp_path, file_name="cent", centroids=cents)
        assert out is not None and str(tmp_path) in str(out)

    def test_wrap_lon_appends_seam_column(self, grid_da):
        p = GriddedPlotter(grid_da, DIMS, DIMS)
        vals = np.asarray(grid_da.isel(time=0).values)
        lon = np.asarray(grid_da.coords["lon"].values)
        wrapped, wlon = p.wrap_lon(vals, lon)
        assert wrapped.shape[1] == vals.shape[1] + 1
        np.testing.assert_array_equal(wrapped[:, -1], vals[:, 0])
        assert wlon[-1] == pytest.approx(lon[0] + 360.0)
