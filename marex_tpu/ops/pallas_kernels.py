"""
Pallas TPU kernels — RETIRED EXPERIMENT, kept for reference.

The CCL fixpoint loop (ops/label.py) is bandwidth-bound: each iteration reads
the label map, takes a 3x3 neighbourhood min, masks, and writes it back.
This kernel fuses pad + 9-way min + mask into a single VMEM pass per
time-block grid step.

Measured on a TPU v5e chip against the XLA 9-slice stencil
(3652x120x240 int32 labels): full-CCL wall identical (2.99 s both ways —
the fused XLA stencil already saturates HBM bandwidth), the isolated Pallas
step ~35 ms/pass, and Mosaic failed to lower time blocks >= 16. Per the
prove-or-drop rule it is NOT wired into the tracking path; the jnp 9-slice
stencil is the production kernel. Enable manually via MAREX_ENABLE_PALLAS=1
only for experimentation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_BIG = np.int32(2**31 - 1)


def _min9_block(lab):
    """9-way neighbourhood min of a (TB, H, W) VMEM block, periodic x."""
    from jax.experimental.pallas import tpu as pltpu

    TB, H, W = lab.shape
    # NOTE: pltpu.roll requires non-negative shifts on this backend; roll by
    # (n - 1) is the same rotation as -1
    left = pltpu.roll(lab, 1, 2)
    right = pltpu.roll(lab, W - 1, 2)
    row = jnp.minimum(jnp.minimum(left, lab), right)  # horizontal 3-min

    up = pltpu.roll(row, 1, 1)
    down = pltpu.roll(row, H - 1, 1)
    # mask the wrapped y rows to BIG (no y periodicity)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (TB, H, W), 1)
    up = jnp.where(row_ids == 0, _BIG, up)
    down = jnp.where(row_ids == H - 1, _BIG, down)
    return jnp.minimum(jnp.minimum(up, row), down)


def _stencil_kernel_masked(lab_ref, data_ref, out_ref):
    """out = where(data, min9(lab), BIG) — the 2-D CCL iteration body."""
    out_ref[...] = jnp.where(data_ref[...], _min9_block(lab_ref[...]), _BIG)


def _stencil_kernel_plain(lab_ref, out_ref):
    """out = min9(lab) — spatial plane min for the 3-D CCL iteration."""
    out_ref[...] = _min9_block(lab_ref[...])


@partial(jax.jit, static_argnames=("masked", "time_block"))
def min_stencil_pallas(lab: jax.Array, data: jax.Array | None, masked: bool = True, time_block: int = 8) -> jax.Array:
    """
    Fused CCL stencil step on (T, H, W) int32 labels (periodic x), tiled over
    time blocks with the full (H, W) slice in VMEM.

    masked=True  : ``where(data, 3x3-min(lab), BIG)``  (2-D per-slice CCL)
    masked=False : ``3x3-min(lab)``                     (plane min for 3-D CCL)
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, H, W = lab.shape
    tb = min(time_block, T)
    T_pad = -(-T // tb) * tb
    if T_pad != T:
        lab = jnp.pad(lab, ((0, T_pad - T), (0, 0), (0, 0)), constant_values=_BIG)
        if masked:
            data = jnp.pad(data, ((0, T_pad - T), (0, 0), (0, 0)), constant_values=False)

    spec = pl.BlockSpec((tb, H, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    if masked:
        out = pl.pallas_call(
            _stencil_kernel_masked,
            out_shape=jax.ShapeDtypeStruct((T_pad, H, W), jnp.int32),
            grid=(T_pad // tb,),
            in_specs=[spec, spec],
            out_specs=spec,
        )(lab, data)
    else:
        out = pl.pallas_call(
            _stencil_kernel_plain,
            out_shape=jax.ShapeDtypeStruct((T_pad, H, W), jnp.int32),
            grid=(T_pad // tb,),
            in_specs=[spec],
            out_specs=spec,
        )(lab)
    return out[:T]


def pallas_available() -> bool:
    """
    True when the fused Pallas stencil should be used.

    Currently opt-in (MAREX_ENABLE_PALLAS=1) on the TPU backend: the XLA
    9-slice stencil already fuses into a single pass, and kernel compile
    time over remote-device links can dominate; flip the default once the
    kernel is profiled on local TPU hosts.
    """
    import os

    if os.environ.get("MAREX_ENABLE_PALLAS", "").strip() not in ("1", "true"):
        return False
    try:
        # "axon" is a tunneled TPU backend (dev harness); same Mosaic target
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False
