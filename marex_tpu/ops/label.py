"""
Connected-component labeling (CCL) as fixed-point min-label propagation.

TPU-native replacement for the reference's labeling substrate:

* per-timestep 2-D labeling with 8-connectivity and periodic longitude
  <- dask_image.ndmeasure.label(structure 2-D, wrap_axes=(2,))
     (track.py:2007-2034)
* full 3-D spatio-temporal labeling (time connectivity, Scannell-style)
  <- dask_image label with a full 3x3x3 structure (track.py:2011-2013)
* per-timestep labeling over unstructured neighbour graphs
  <- scipy csgraph connected_components per slice (track.py:1947-1999)

Algorithm: every active cell starts labeled with its own flat index; repeat
{neighbourhood-min over the connectivity stencil; two pointer-jumping hops
(label <- label[label])} until fixpoint.  Pointer jumping gives O(log D)
convergence in component diameter D, so even globe-wrapping filaments settle
in a few dozen fused XLA iterations.  Labels are then densified to 1..N by a
rank-over-roots cumsum (still on device).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

_BIG = jnp.int32(2**31 - 1)


def _shift2d(lab: jax.Array, dy: int, dx: int, wrap_x: bool) -> jax.Array:
    """Shift a (..., H, W) label map; out-of-range cells become _BIG."""
    out = lab
    if dy != 0:
        out = jnp.roll(out, dy, axis=-2)
        if dy > 0:
            out = out.at[..., :dy, :].set(_BIG)
        else:
            out = out.at[..., dy:, :].set(_BIG)
    if dx != 0:
        out = jnp.roll(out, dx, axis=-1)
        if not wrap_x:
            if dx > 0:
                out = out.at[..., :, :dx].set(_BIG)
            else:
                out = out.at[..., :, dx:].set(_BIG)
    return out


def _jump(lab_flat: jax.Array) -> jax.Array:
    """One pointer-jumping hop on (..., N) flat labels (BIG = inactive)."""
    idx = jnp.where(lab_flat == _BIG, 0, lab_flat)
    hopped = jnp.take_along_axis(lab_flat, idx, axis=-1)
    return jnp.where(lab_flat == _BIG, _BIG, jnp.minimum(lab_flat, hopped))


@partial(jax.jit, static_argnames=("wrap_x", "max_iters"))
def label_slices_grid(data: jax.Array, wrap_x: bool = True, max_iters: int = 512) -> Tuple[jax.Array, jax.Array]:
    """
    Per-timestep 2-D CCL with 8-connectivity.

    Parameters
    ----------
    data : (T, H, W) bool
    wrap_x : periodic in the last (longitude) axis

    Returns
    -------
    labels : (T, H, W) int32, densified per slice (1..n_t, 0 = background)
    counts : (T,) int32 number of components per slice
    """
    T, H, W = data.shape
    flat_idx = jnp.arange(H * W, dtype=jnp.int32).reshape(1, H, W)
    lab = jnp.where(data, flat_idx, _BIG)

    offsets = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1) if (dy, dx) != (0, 0)]

    def step(state):
        lab, _, it = state
        m = lab
        for dy, dx in offsets:
            m = jnp.minimum(m, _shift2d(lab, dy, dx, wrap_x))
        m = jnp.where(data, m, _BIG)
        mf = m.reshape(T, H * W)
        mf = _jump(_jump(mf))
        new = mf.reshape(T, H, W)
        return new, jnp.any(new != lab), it + 1

    def cond(state):
        _, changed, it = state
        return jnp.logical_and(changed, it < max_iters)

    lab, _, _ = jax.lax.while_loop(cond, step, (lab, jnp.bool_(True), jnp.int32(0)))

    labf = lab.reshape(T, H * W)
    is_root = jnp.logical_and(data.reshape(T, H * W), labf == flat_idx.reshape(1, H * W))
    rank = jnp.cumsum(is_root.astype(jnp.int32), axis=1)  # inclusive rank
    idx = jnp.where(labf == _BIG, 0, labf)
    dense = jnp.where(labf == _BIG, 0, jnp.take_along_axis(rank, idx, axis=1))
    counts = rank[:, -1]
    return dense.reshape(T, H, W), counts


@partial(jax.jit, static_argnames=("wrap_x", "max_iters"))
def label_spacetime_grid(data: jax.Array, wrap_x: bool = True, max_iters: int = 1024) -> Tuple[jax.Array, jax.Array]:
    """
    Full 3-D (time, y, x) CCL with 3x3x3 connectivity — events connected
    across time including spatio-temporal diagonals, the
    ``time_connectivity=True`` path of the reference (track.py:2011-2013).

    Returns
    -------
    labels : (T, H, W) int32 globally dense (1..N, 0 = background)
    n : ()   int32 total number of events
    """
    T, H, W = data.shape
    N = T * H * W
    flat_idx = jnp.arange(N, dtype=jnp.int32).reshape(T, H, W)
    lab = jnp.where(data, flat_idx, _BIG)

    offsets = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]

    def spatial_min(x):
        m = x
        for dy, dx in offsets:
            if (dy, dx) == (0, 0):
                continue
            m = jnp.minimum(m, _shift2d(x, dy, dx, wrap_x))
        return m

    def tshift(x, dt):
        out = jnp.roll(x, dt, axis=0)
        if dt > 0:
            out = out.at[:dt].set(_BIG)
        else:
            out = out.at[dt:].set(_BIG)
        return out

    def step(state):
        lab, _, it = state
        # min over the full 3x3x3 neighbourhood = spatial 3x3 min of each of
        # the t-1, t, t+1 planes
        plane = jnp.minimum(lab, spatial_min(lab))
        m = jnp.minimum(plane, jnp.minimum(tshift(plane, 1), tshift(plane, -1)))
        m = jnp.where(data, m, _BIG)
        mf = m.reshape(1, N)
        mf = _jump(_jump(mf))
        new = mf.reshape(T, H, W)
        return new, jnp.any(new != lab), it + 1

    def cond(state):
        _, changed, it = state
        return jnp.logical_and(changed, it < max_iters)

    lab, _, _ = jax.lax.while_loop(cond, step, (lab, jnp.bool_(True), jnp.int32(0)))

    labf = lab.reshape(N)
    is_root = jnp.logical_and(data.reshape(N), labf == jnp.arange(N, dtype=jnp.int32))
    rank = jnp.cumsum(is_root.astype(jnp.int32))
    idx = jnp.where(labf == _BIG, 0, labf)
    dense = jnp.where(labf == _BIG, 0, rank[idx])
    return dense.reshape(T, H, W), rank[-1]


@partial(jax.jit, static_argnames=("max_iters",))
def label_slices_unstructured(
    data: jax.Array, neighbours: jax.Array, max_iters: int = 512
) -> Tuple[jax.Array, jax.Array]:
    """
    Per-timestep CCL on an unstructured triangular mesh.

    data : (T, C) bool (already masked)
    neighbours : (3, C) int32 0-based adjacency, -1 = missing

    Returns per-slice dense labels (1..n_t per slice, 0 = background) and
    per-slice counts — the ID convention of the reference's per-slice
    csgraph labeling (track.py:1947-1999).
    """
    T, C = data.shape
    flat_idx = jnp.arange(C, dtype=jnp.int32)[None, :]
    lab = jnp.where(data, flat_idx, _BIG)

    nb_idx = jnp.maximum(neighbours, 0)  # (3, C)
    nb_valid = neighbours >= 0

    def step(state):
        lab, _, it = state
        g = lab[:, nb_idx]  # (T, 3, C)
        g = jnp.where(nb_valid[None], g, _BIG)
        m = jnp.minimum(lab, jnp.min(g, axis=1))
        m = jnp.where(data, m, _BIG)
        m = _jump(_jump(m))
        return m, jnp.any(m != lab), it + 1

    def cond(state):
        _, changed, it = state
        return jnp.logical_and(changed, it < max_iters)

    lab, _, _ = jax.lax.while_loop(cond, step, (lab, jnp.bool_(True), jnp.int32(0)))

    is_root = jnp.logical_and(data, lab == flat_idx)
    rank = jnp.cumsum(is_root.astype(jnp.int32), axis=1)
    idx = jnp.where(lab == _BIG, 0, lab)
    dense = jnp.where(lab == _BIG, 0, jnp.take_along_axis(rank, idx, axis=1))
    return dense, rank[:, -1]


@jax.jit
def offset_labels_across_time(labels: jax.Array, counts: jax.Array) -> jax.Array:
    """
    Make per-slice labels globally unique by cumulative offsets — the
    cumsum-shift trick of track.py:2762-2764.

    labels : (T, ...) int32 per-slice dense labels
    counts : (T,) per-slice component counts
    """
    offsets = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(counts)[:-1].astype(jnp.int32)])
    shape = (labels.shape[0],) + (1,) * (labels.ndim - 1)
    return jnp.where(labels > 0, labels + offsets.reshape(shape), 0)
