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
