"""IO layer: dependency-free zarr v2 stores (+ optional xarray interop)."""

from .zarr_lite import open_zarr, to_zarr

__all__ = ["open_zarr", "to_zarr"]
