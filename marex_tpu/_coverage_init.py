"""
Coverage bootstrap for subprocess measurement.

Role-equivalent of the reference's ``marEx/_coverage_init.py:11-40`` (which
started coverage inside Dask worker processes and disabled Numba JIT under
coverage). This framework has no worker processes — compute runs in-process
on the accelerator — so the shim only needs to (a) start coverage when a
parent test runner requests it via ``COVERAGE_PROCESS_START`` and (b) force
the pure-numpy fallbacks of the native C++ layer so host-side kernel logic is
measured (``MAREX_DISABLE_NATIVE``).
"""

from __future__ import annotations

import os


def setup_coverage_environment() -> bool:
    """Start coverage in this process if requested; returns True if started."""
    cfg = os.environ.get("COVERAGE_PROCESS_START")
    if not cfg:
        return False
    # measure the python bodies of the host kernels, not the C++ library
    os.environ.setdefault("MAREX_DISABLE_NATIVE", "1")
    try:
        import coverage

        coverage.process_startup()
        return True
    except Exception:  # pragma: no cover
        return False


_STARTED = setup_coverage_environment()
