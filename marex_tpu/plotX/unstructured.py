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
from ..exceptions import DataValidationError, VisualisationError
from .base import PlotterBase

# module-level cache of triangulations / KD-trees keyed by (n_cells, res)
_GRID_CACHE: Dict[Any, Any] = {}


def clear_cache() -> None:
    """Clear the global grid cache (triangulations + KD-tree regrids) —
    reference parity (plotX/unstructured.py:44-48). Needed when a grid file
    is regenerated under the same path mid-session."""
    _GRID_CACHE.clear()


def _load_triangulation(fpath_tgrid) -> Any:
    """Load + cache a matplotlib Triangulation from a tgrid store
    (zarr-lite analogue of the reference's NetCDF loader,
    plotX/unstructured.py:50-83): requires ``vertex_of_cell`` plus either
    ``clon``/``clat`` (radians) or ``vlon``/``vlat`` (degrees)."""
    from matplotlib.tri import Triangulation

    from ..io.zarr_lite import open_zarr

    key = ("tgrid", str(fpath_tgrid))
    if key in _GRID_CACHE:
        return _GRID_CACHE[key]
    g = open_zarr(str(fpath_tgrid))
    has_rad = "clon" in g.data_vars and "clat" in g.data_vars
    has_deg = "vlon" in g.data_vars and "vlat" in g.data_vars
    if "vertex_of_cell" not in g.data_vars or not (has_rad or has_deg):
        raise DataValidationError(
            "Invalid triangulation grid file format",
            details="Missing required variables for triangulation",
            suggestions=[
                "Ensure grid file contains 'vertex_of_cell' plus 'clon'/'clat' (or 'vlon'/'vlat') variables",
                "Check grid file format and variable names",
                "Verify unstructured grid file is properly formatted",
            ],
            context={
                "required_vars": ["vertex_of_cell", "clon", "clat"],
                "available_vars": list(g.data_vars),
            },
        )
    clon_v = np.rad2deg(np.asarray(g["clon"].values)) if has_rad else np.asarray(g["vlon"].values)
    clat_v = np.rad2deg(np.asarray(g["clat"].values)) if has_rad else np.asarray(g["vlat"].values)
    voc = np.asarray(g["vertex_of_cell"].values).T - 1
    tri = Triangulation(clon_v, clat_v, voc)
    _GRID_CACHE[key] = tri
    return tri


def _load_ckdtree(fpath_ckdtree, res: float) -> Dict[str, np.ndarray]:
    """Load + cache precomputed nearest-cell regrid indices from a ckdtree
    directory (reference plotX/unstructured.py:85-116): expects
    ``res{res:3.2f}.zarr`` inside the directory with ``ickdtree_c`` (flat
    nearest-cell index per raster point), ``lon`` and ``lat`` axes."""
    import os

    from ..io.zarr_lite import open_zarr

    key = ("ckdt_file", str(fpath_ckdtree), float(res))
    if key in _GRID_CACHE:
        return _GRID_CACHE[key]
    store = os.path.join(str(fpath_ckdtree), f"res{res:3.2f}.zarr")
    if not os.path.isdir(store):
        raise DataValidationError(
            "KDTree file not found",
            details=f"Expected store at {store} for resolution {res}",
            suggestions=[
                "Check that the ckdtree path is correct",
                "Verify the resolution value matches available files",
                "Ensure ckdtree data files are available",
            ],
            context={"expected_file": store, "resolution": res},
        )
    ds = open_zarr(store)
    entry = {
        "indices": np.asarray(ds["ickdtree_c"].values),
        "lon": np.asarray(ds["lon"].values),
        "lat": np.asarray(ds["lat"].values),
    }
    _GRID_CACHE[key] = entry
    return entry


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

        if self.fpath_tgrid is not None:
            # explicit triangulation grid file (zarr-lite store with
            # vertex coords + vertex_of_cell), cf. unstructured.py:170-197
            return _load_triangulation(self.fpath_tgrid)

        key = ("tri", len(lon), None)
        if key in _GRID_CACHE:
            return _GRID_CACHE[key]
        # Delaunay triangulation of the cell centres (drop seam-crossing
        # triangles so the periodic wrap doesn't smear the plot)
        tri = Triangulation(lon, lat)
        span = np.ptp(lon[tri.triangles], axis=1)
        tri.set_mask(span > 180.0)
        _GRID_CACHE[key] = tri
        return tri

    def _kdtree_regrid(self, lon, lat, vals, res: float = 1.0):
        import os

        if self.fpath_ckdtree is not None and os.path.isdir(str(self.fpath_ckdtree)):
            # precomputed nearest-cell indices shipped with the mesh (the
            # reference's ICON ckdtree directories) — no tree build at all
            entry = _load_ckdtree(self.fpath_ckdtree, res)
            glon, glat = np.meshgrid(entry["lon"], entry["lat"])
            return glon, glat, vals[entry["indices"].reshape(glon.shape)]

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
