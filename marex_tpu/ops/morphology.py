"""
Binary morphology kernels (device, jit-friendly).

TPU-native equivalents of the reference's morphological preprocessing:

* structured closing/opening with a disk structuring element and periodic
  (or edge) padding            <- dask_image.ndmorph binary_closing/opening
                                  (track.py:1608-1671)
* temporal closing along time  <- binary_closing with a (T_fill+1) kernel
                                  (track.py:1675-1726)
* unstructured closing/opening by iterated neighbour-graph dilation
                               <- sparse boolean matrix powers
                                  (track.py:1542-1606, 5422-5468)

Dilation/erosion decompose the disk into per-row runs evaluated as fused
shifted OR/AND passes (a single-channel kxk conv cannot tile onto the MXU;
the run decomposition is bandwidth-bound on the VPU and ~10x faster); the
neighbour-graph version is an iterated gather-or, the graph analogue of a
stencil.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def disk_kernel(radius: int) -> np.ndarray:
    """Disk structuring element: r^2 < radius^2 + 1 (track.py:1612-1616)."""
    y, x = np.ogrid[-radius : radius + 1, -radius : radius + 1]
    return (x**2 + y**2) < (radius**2 + 1)


def _shift_axis(x: jax.Array, d: int, axis: int, fill: bool) -> jax.Array:
    """Static shift of ``x`` by ``d`` along ``axis``, filling with ``fill``."""
    if d == 0:
        return x
    n = x.shape[axis]
    pad_shape = list(x.shape)
    pad_shape[axis] = abs(d)
    pad = jnp.full(pad_shape, fill, x.dtype)
    sl = [slice(None)] * x.ndim
    if d > 0:
        sl[axis] = slice(0, n - d)
        return jnp.concatenate([pad, x[tuple(sl)]], axis=axis)
    sl[axis] = slice(-d, n)
    return jnp.concatenate([x[tuple(sl)], pad], axis=axis)


def _dilate_1d(x: jax.Array, h: int, axis: int, fill: bool = False) -> jax.Array:
    """Boolean dilation by the window [-h, h] along ``axis`` via a doubling
    chain of shifted ORs — O(log h) elementwise passes, no convolution.
    ``fill`` is the out-of-array value shifted in at the edges."""
    r = 0
    while r < h:
        s = min(max(r, 1), h - r)
        x = jnp.logical_or(x, jnp.logical_or(_shift_axis(x, s, axis, fill), _shift_axis(x, -s, axis, fill)))
        r += s
    return x


def _dilate_disk(x: jax.Array, radius: int, fill: bool = False) -> jax.Array:
    """
    Boolean dilation of a (T, H, W) stack by ``disk_kernel(radius)`` expressed
    as row runs: the disk is the union over dy of a centred x-run of
    half-width isqrt(R^2 - dy^2), so dilation = OR over dy-shifts of 1-D
    x-dilations.  Purely elementwise shifted ORs — the TPU-friendly
    formulation (a single-channel kxk conv cannot tile onto the MXU, and the
    VPU does this in a handful of fused bandwidth-bound passes).
    """
    # distinct row half-widths, ascending, with incremental reuse:
    # dilating an already h0-dilated row by (h1 - h0) yields the h1 dilation
    hw = [math.isqrt(radius * radius - dy * dy) for dy in range(radius + 1)]
    dil_x = {}
    cur, reach = x, 0
    for h in sorted(set(hw)):
        cur = _dilate_1d(cur, h - reach, axis=-1, fill=fill)
        reach = h
        dil_x[h] = cur
    out = dil_x[hw[0]]
    for dy in range(1, radius + 1):
        row = dil_x[hw[dy]]
        out = jnp.logical_or(
            out, jnp.logical_or(_shift_axis(row, dy, -2, fill), _shift_axis(row, -dy, -2, fill))
        )
    return out


def _erode_disk(x: jax.Array, radius: int, outside: bool = True) -> jax.Array:
    """Erosion as the complement-dual of dilation for the symmetric disk.
    ``outside`` is the value assumed beyond the array edge: True preserves
    borders (our previous default); False erodes at borders, which is
    scipy/dask_image's ``border_value=0`` behaviour that the reference
    inherits (track.py:1630-1634)."""
    return jnp.logical_not(_dilate_disk(jnp.logical_not(x), radius, fill=not outside))


@partial(jax.jit, static_argnames=("radius", "mode"))
def binary_close_open_grid(data: jax.Array, radius: int, mask: jax.Array, mode: str = "wrap") -> jax.Array:
    """
    Fill holes & gaps: closing (dilate->erode) then opening (erode->dilate)
    with a disk of ``radius``; pad by 2R in both spatial dims with ``wrap``
    (global, periodic) or ``edge`` (regional) mode, then trim and re-apply the
    land mask — bit-exact with the reference's dask_image pipeline
    (track.py:1608-1671): same 2R pad AND scipy's border_value=0 erosion
    semantics (a 4R pad with border-preserving erosion is exactly
    translation-invariant under the periodic boundary, but diverges from the
    reference within R of the longitude seam — verified 163 differing cells
    on the reference fixture — and event parity requires the reference's
    geometry, quirks included).

    data : (T, H, W) bool
    mask : (H, W) bool (True = valid ocean)
    """
    if radius == 0:
        return jnp.logical_and(data, mask[None])

    d = 2 * radius
    pad_mode = "wrap" if mode == "wrap" else "edge"

    # Per-slice op -> tile over time (lax.map batches) so the padded
    # intermediate chain stays bounded: at century/0.25deg scale the
    # full-width chain holds ~10 padded bool temporaries (~7 GB) and
    # OOMs alongside the resident detect outputs.
    def one_slice(sl):
        x = jnp.pad(sl[None], ((0, 0), (d, d), (d, d)), mode=pad_mode)
        x = _dilate_disk(x, radius)  # closing
        x = _erode_disk(x, radius, outside=False)
        x = _erode_disk(x, radius, outside=False)  # opening
        x = _dilate_disk(x, radius)
        return x[0, d:-d, d:-d]

    T = data.shape[0]
    x = jax.lax.map(one_slice, data, batch_size=min(128, T))
    return jnp.logical_and(x, mask[None])


@partial(jax.jit, static_argnames=("t_fill",))
def binary_close_time(data: jax.Array, t_fill: int) -> jax.Array:
    """
    Temporal binary closing along axis 0 with a ones-kernel of length
    ``t_fill + 1``, constant (False) padded — fills gaps up to ``t_fill``
    steps (track.py:1692-1721).

    data : (T, ...) bool
    """
    if t_fill == 0:
        return data
    k = t_fill + 1
    lo, hi = k // 2, k - 1 - k // 2

    def pool(x, combine, pad_value):
        T = x.shape[0]
        pads = [(lo, hi)] + [(0, 0)] * (x.ndim - 1)
        xp = jnp.pad(x, pads, constant_values=pad_value)
        out = xp[0:T]
        for d in range(1, k):
            out = combine(out, xp[d : d + T])
        return out

    x = jnp.pad(data, [(k, k)] + [(0, 0)] * (data.ndim - 1), mode="constant", constant_values=False)
    # dilation: k-way OR of shifted slices; erosion: k-way AND — XLA fuses
    # these into one stencil pass (and they vectorise on the CPU backend,
    # unlike lax.reduce_window)
    x = pool(x, jnp.logical_or, False)
    x = pool(x, jnp.logical_and, True)
    return x[k:-k]


@partial(jax.jit, static_argnames=())
def neighbour_dilate_step(vec: jax.Array, neighbours: jax.Array) -> jax.Array:
    """
    One graph-dilation step on an unstructured mesh: a cell becomes True if it
    is True or any of its (up to 3) neighbours is True.  ``neighbours`` is the
    (3, C) 0-based adjacency with -1 for missing; the identity term mirrors
    the reference's +I in the sparse dilation matrix (track.py:1113-1115).

    vec : (..., C) bool
    """
    idx = jnp.maximum(neighbours, 0)  # (3, C)
    valid = neighbours >= 0
    gathered = vec[..., idx]  # (..., 3, C)
    gathered = jnp.logical_and(gathered, valid)
    return jnp.logical_or(vec, jnp.any(gathered, axis=-2))


@partial(jax.jit, static_argnames=("steps",))
def neighbour_dilate(vec: jax.Array, neighbours: jax.Array, steps: int) -> jax.Array:
    """Iterated graph dilation — (adjacency + I)^steps @ vec (track.py:5422-5468)."""

    def body(_, v):
        return neighbour_dilate_step(v, neighbours)

    return jax.lax.fori_loop(0, steps, body, vec)


@partial(jax.jit, static_argnames=("radius",))
def binary_close_open_unstructured(
    data: jax.Array, neighbours: jax.Array, mask: jax.Array, radius: int
) -> jax.Array:
    """
    Closing then opening by graph distance ``radius`` on the mesh, protecting
    the shoreline by setting land True before each erosion — the exact
    operation order of the reference's ``binary_open_close``
    (track.py:1549-1582).

    data : (T, C) bool; mask : (C,) bool

    Note: like the reference, land cells may come out True (they are removed
    later at labeling time, where the mask is re-applied).
    """
    if radius == 0:
        return data

    land = ~mask

    x = neighbour_dilate(data, neighbours, radius)  # dilation
    x = jnp.logical_or(x, land[None])  # protect shore
    x = ~neighbour_dilate(~x, neighbours, radius)  # erosion
    x = jnp.logical_or(x, land[None])  # protect shore
    x = ~neighbour_dilate(~x, neighbours, radius)  # erosion
    x = neighbour_dilate(x, neighbours, radius)  # dilation
    return x
