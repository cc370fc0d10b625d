"""
UnstructuredPlotter: triangular-mesh rendering (cf. plotX/unstructured.py).

Two render paths, like the reference:

* native triangulation (``tripcolor``) — from an explicit tgrid file
  (``vertex_of_cell``/``clon``/``clat``) when supplied via
  :func:`marex_tpu.plotX.specify_grid`, otherwise a cached Delaunay
  triangulation of the cell-centre coordinates;
* nearest-neighbour regrid to a regular lat/lon raster via a cached
  scipy cKDTree (the reference's precomputed-ckdtree path).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

from ..core.field import Field
from ..exceptions import VisualisationError
from .base import PlotterBase

# module-level cache of triangulations / KD-trees keyed by (n_cells, res)
_GRID_CACHE: Dict[Any, Any] = {}


class UnstructuredPlotter(PlotterBase):
    """Plotter for unstructured (time, ncells) data."""

    def __init__(self, da: Field, dimensions=None, coordinates=None) -> None:
        if dimensions is None:
            dimensions = {"time": "time", "x": "ncells"}
        if coordinates is None:
            coordinates = {"time": "time", "x": "lon", "y": "lat"}
        dimensions = dict(dimensions)
        dimensions.pop("y", None)  # unstructured has no y dim
        super().__init__(da, dimensions, coordinates)
        self.fpath_tgrid: Optional[str] = None
        self.fpath_ckdtree: Optional[str] = None

    def specify_grid(self, fpath_tgrid: Optional[str] = None, fpath_ckdtree: Optional[str] = None) -> None:
        self.fpath_tgrid = fpath_tgrid
        self.fpath_ckdtree = fpath_ckdtree

    # -- helpers ---------------------------------------------------------

    def _cell_coords(self, da: Field) -> Tuple[np.ndarray, np.ndarray]:
        lon = np.asarray(da.coords[self.coordinates["x"]].values, dtype=float)
        lat = np.asarray(da.coords[self.coordinates["y"]].values, dtype=float)
        return lon, lat

    def _triangulation(self, lon: np.ndarray, lat: np.ndarray):
        from matplotlib.tri import Triangulation

        key = ("tri", len(lon), self.fpath_tgrid)
        if key in _GRID_CACHE:
            return _GRID_CACHE[key]

        if self.fpath_tgrid is not None:
            # explicit triangulation grid file (zarr-lite store with
            # vertex coords + vertex_of_cell), cf. unstructured.py:170-197
            from ..io.zarr_lite import open_zarr

            g = open_zarr(self.fpath_tgrid)
            clon_v = np.rad2deg(np.asarray(g["clon"].values)) if "clon" in g else np.asarray(g["vlon"].values)
            clat_v = np.rad2deg(np.asarray(g["clat"].values)) if "clat" in g else np.asarray(g["vlat"].values)
            voc = np.asarray(g["vertex_of_cell"].values).T - 1
            tri = Triangulation(clon_v, clat_v, voc)
        else:
            # Delaunay triangulation of the cell centres (drop seam-crossing
            # triangles so the periodic wrap doesn't smear the plot)
            tri = Triangulation(lon, lat)
            span = np.ptp(lon[tri.triangles], axis=1)
            tri.set_mask(span > 180.0)
        _GRID_CACHE[key] = tri
        return tri

    def _kdtree_regrid(self, lon, lat, vals, res: float = 1.0):
        from scipy.spatial import cKDTree

        key = ("kdt", len(lon), res)
        if key not in _GRID_CACHE:
            glon, glat = np.meshgrid(np.arange(-180, 180, res), np.arange(-90, 90.0001, res))
            tree = cKDTree(np.column_stack([((lon + 180) % 360) - 180, lat]))
            _, idx = tree.query(np.column_stack([glon.ravel(), glat.ravel()]))
            _GRID_CACHE[key] = (glon, glat, idx)
        glon, glat, idx = _GRID_CACHE[key]
        return glon, glat, vals[idx].reshape(glon.shape)

    # -- rendering ---------------------------------------------------------

    def plot(self, ax: Any, cmap: Any, clim: Optional[Tuple[float, float]] = None, norm: Optional[Any] = None):
        da = self.da
        tdim = self.dimensions.get("time", "time")
        if tdim in da.dims:
            da = da.isel({tdim: 0})

        lon, lat = self._cell_coords(da)
        vals = np.asarray(da.values, dtype=float)
        if vals.ndim != 1 or len(vals) != len(lon):
            raise VisualisationError(
                "Unstructured plotting expects 1-D cell data matching lon/lat coords",
                context={"data_shape": vals.shape, "n_cells": len(lon)},
            )

        kwargs: Dict[str, Any] = dict(cmap=cmap)
        if norm is not None:
            kwargs["norm"] = norm
        elif clim is not None:
            kwargs["vmin"], kwargs["vmax"] = clim
        if self._ccrs is not None and hasattr(ax, "projection"):
            kwargs["transform"] = self._ccrs.PlateCarree()

        if self.fpath_ckdtree is not None:
            glon, glat, grid_vals = self._kdtree_regrid(lon, lat, vals)
            im = ax.pcolormesh(glon, glat, grid_vals, shading="auto", **kwargs)
        else:
            tri = self._triangulation(lon, lat)
            finite = np.isfinite(vals)
            plot_vals = np.where(finite, vals, 0.0)
            im = ax.tripcolor(tri, plot_vals, **kwargs)
        return ax, im
