"""Device kernels (jit/pallas) for marex_tpu."""

from . import climatology, detrend, quantile  # noqa: F401

__all__ = ["climatology", "detrend", "quantile"]
