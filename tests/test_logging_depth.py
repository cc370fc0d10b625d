"""Logging/observability depth tests: profile_trace, array/memory logging on
real pipeline objects, exception-path logging, and the exception-to-telemetry
contract (reference scope: tests/test_logging_system.py TestIntegration +
TestMemoryLogging + the marEx logging docs' observability matrix)."""

import logging
import os

import numpy as np
import pandas as pd
import pytest

import marex_tpu as marEx
from marex_tpu.core.field import Field

from marex_tpu.exceptions import DataValidationError
from marex_tpu.logging_config import (
    configure_logging,
    get_logger,
    get_memory_usage,
    log_array_info,
    log_dask_info,
    log_memory_usage,
    log_timing,
    profile_trace,
    set_normal_logging,
)


class _CaptureHandler(logging.Handler):
    def __init__(self):
        super().__init__(level=logging.DEBUG)
        self.records = []

    def emit(self, record):
        self.records.append(record)


@pytest.fixture
def pkg_text():
    """Capture formatted records on the package logger itself:
    configure_logging sets propagate=False, so pytest's root-attached caplog
    sees nothing from marex_tpu loggers."""
    lg = logging.getLogger("marex_tpu")
    prev = lg.level
    lg.setLevel(logging.DEBUG)
    h = _CaptureHandler()
    lg.addHandler(h)
    try:
        yield lambda: "\n".join(r.getMessage() for r in h.records)
    finally:
        lg.removeHandler(h)
        lg.setLevel(prev)
        set_normal_logging()


@pytest.fixture(autouse=True)
def _reset_logging():
    yield
    set_normal_logging()


@pytest.fixture
def small_field():
    rng = np.random.default_rng(0)
    T, H, W = 30, 6, 12
    return Field(
        (15 + rng.standard_normal((T, H, W))).astype(np.float32),
        ("time", "lat", "lon"),
        {
            "time": pd.date_range("2020-01-01", periods=T, freq="D").to_numpy(),
            "lat": np.linspace(-30, 30, H),
            "lon": np.linspace(0, 360, W, endpoint=False),
        },
        name="sst",
    )


class TestProfileTrace:
    def test_profile_trace_writes_trace_dir(self, tmp_path):
        """profile_trace must produce an on-disk JAX profiler trace around a
        real compiled computation (the Dask-dashboard replacement)."""
        import jax.numpy as jnp

        tdir = str(tmp_path / "trace")
        with profile_trace(tdir):
            x = jnp.arange(128.0)
            float((x * 2).sum())
        produced = [os.path.join(dp, f) for dp, _, fs in os.walk(tdir) for f in fs]
        assert produced, "profiler trace directory is empty"

    def test_profile_trace_stops_on_exception(self, tmp_path):
        import jax

        with pytest.raises(RuntimeError):
            with profile_trace(str(tmp_path / "trace2")):
                raise RuntimeError("boom")
        # trace must be closed: starting a fresh one succeeds
        jax.profiler.start_trace(str(tmp_path / "trace3"))
        jax.profiler.stop_trace()


class TestArrayAndMemoryLogging:
    def test_log_array_info_reports_shape_and_dtype(self, small_field, pkg_text):
        lg = get_logger("test.arrayinfo")
        log_array_info(lg, small_field, "SST block")
        text = pkg_text()
        assert "SST block" in text
        assert "30" in text and "float32" in text

    def test_log_dask_info_compat_shim(self, small_field, pkg_text):
        lg = get_logger("test.daskinfo")
        log_dask_info(lg, small_field, "Array")
        assert "Array" in pkg_text()

    def test_log_dask_info_swallows_weird_objects(self, caplog):
        lg = get_logger("test.daskinfo2")

        class Weird:
            @property
            def shape(self):
                raise RuntimeError("no shape")

        log_dask_info(lg, Weird(), "weird")  # must not raise

    def test_get_memory_usage_has_host_fields(self):
        usage = get_memory_usage()
        assert isinstance(usage, dict)
        assert any("host" in k or "rss" in k for k in usage)

    def test_log_memory_usage_emits(self, pkg_text):
        lg = get_logger("test.mem")
        log_memory_usage(lg, "Stage X")
        assert "Stage X" in pkg_text()


class TestPipelineLogging:
    def test_preprocess_error_path_logs_before_raise(self, small_field, caplog):
        """Validation failures must leave a log trail (telemetry contract),
        not just raise."""
        configure_logging(verbose=True)
        bad = Field(
            np.full(small_field.shape, np.nan, np.float32),
            small_field.dims,
            dict(small_field.coords),
            name="sst",
        )
        with caplog.at_level(logging.DEBUG):
            with pytest.raises(DataValidationError):
                marEx.preprocess_data(bad, method_anomaly="fixed_baseline", method_extreme="global_extreme")

    def test_tracker_summary_print_suppressed_when_quiet_logging(self, small_field, capsys):
        """The tracking-statistics summary prints by design (reference
        parity) regardless of logger level — pin that contract."""
        ds = marEx.preprocess_data(
            small_field, method_anomaly="detrend_harmonic", method_extreme="global_extreme",
            threshold_percentile=90, quiet=True,
        )
        tr = marEx.tracker(ds.extreme_events, ds.mask, R_fill=0, T_fill=0,
                           area_filter_quartile=0.0, allow_merging=False, quiet=True)
        try:
            tr.run()
        except Exception:
            pytest.skip("no events in tiny noise field")
        out = capsys.readouterr().out
        assert "Tracking Statistics" in out

    def test_log_timing_nested(self, pkg_text):
        lg = get_logger("test.nest")
        with log_timing(lg, "outer"):
            with log_timing(lg, "inner"):
                pass
        text = pkg_text()
        assert "Completed: inner" in text
        assert "Completed: outer" in text

    def test_exception_to_dict_is_json_serialisable(self):
        import json

        err = DataValidationError(
            "bad data", details="d", suggestions=["s"], data_info={"shape": [3, 4]}
        )
        payload = json.dumps(err.to_dict())
        assert "bad data" in payload


class TestVerbosityTransitions:
    def test_mode_switching_sequence(self):
        from marex_tpu.logging_config import get_verbosity_level, set_quiet_mode, set_verbose_mode

        set_verbose_mode()
        assert get_verbosity_level() == "verbose"
        set_quiet_mode()
        assert get_verbosity_level() == "quiet"
        set_normal_logging()
        assert get_verbosity_level() == "normal"

    def test_configure_twice_keeps_single_stream_handler(self):
        configure_logging(verbose=True)
        configure_logging(quiet=True)
        pkg = logging.getLogger("marex_tpu")
        stream_handlers = [
            h for h in pkg.handlers
            if isinstance(h, logging.StreamHandler) and not hasattr(h, "baseFilename")
        ]
        assert len(stream_handlers) <= 1
