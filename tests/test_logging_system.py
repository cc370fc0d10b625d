"""Logging-system depth tests, mirroring the reference's
tests/test_logging_system.py coverage: env-var resolution order, the three
verbosity modes and their formats, rotating file handler behaviour,
log_timing (duration + memory), the log_function_call decorator,
ProgressLogger throttling, and idempotent reconfiguration.
"""

import logging
import os

import numpy as np
import pytest

import marex_tpu as marEx
from marex_tpu import logging_config as LC
from marex_tpu.logging_config import (
    ProgressLogger,
    configure_logging,
    get_logger,
    get_verbosity_level,
    is_quiet_mode,
    is_verbose_mode,
    log_dask_info,
    log_function_call,
    log_memory_usage,
    log_timing,
    set_normal_logging,
    set_quiet_mode,
    set_verbose_mode,
)


@pytest.fixture(autouse=True)
def _restore_logging():
    # the package logger is non-propagating by design (own stderr handler);
    # caplog captures at the root, so propagate for the test duration
    logging.getLogger("marex_tpu").propagate = True
    yield
    for var in ("MAREX_VERBOSE", "MAREX_QUIET", "MAREX_LOG_LEVEL", "MAREX_LOG_FILE"):
        os.environ.pop(var, None)
    configure_logging()


class TestModes:
    def test_three_modes(self):
        set_verbose_mode()
        assert is_verbose_mode() and get_verbosity_level() == "verbose"
        set_quiet_mode()
        assert is_quiet_mode() and get_verbosity_level() == "quiet"
        set_normal_logging()
        assert get_verbosity_level() == "normal"
        assert not is_verbose_mode() and not is_quiet_mode()

    def test_quiet_wins_over_verbose(self):
        configure_logging(verbose=True, quiet=True)
        assert get_verbosity_level() == "quiet"

    def test_mode_levels(self):
        lg = configure_logging(verbose=True)
        assert lg.level == logging.DEBUG
        lg = configure_logging(quiet=True)
        assert lg.level >= logging.WARNING
        lg = configure_logging()
        assert lg.level == logging.INFO

    def test_explicit_level_overrides_mode(self):
        lg = configure_logging(verbose=True, level=logging.ERROR)
        assert lg.level == logging.ERROR


class TestEnvVars:
    def test_env_verbose(self, monkeypatch):
        monkeypatch.setenv("MAREX_VERBOSE", "1")
        configure_logging()
        assert is_verbose_mode()

    def test_env_quiet_precedence(self, monkeypatch):
        monkeypatch.setenv("MAREX_VERBOSE", "1")
        monkeypatch.setenv("MAREX_QUIET", "true")
        configure_logging()
        assert is_quiet_mode()

    def test_env_level(self, monkeypatch):
        monkeypatch.setenv("MAREX_LOG_LEVEL", "warning")
        lg = configure_logging()
        assert lg.level == logging.WARNING

    def test_explicit_args_beat_env(self, monkeypatch):
        monkeypatch.setenv("MAREX_QUIET", "1")
        configure_logging(quiet=False, verbose=True)
        assert is_verbose_mode()

    def test_env_log_file(self, monkeypatch, tmp_path):
        path = tmp_path / "env.log"
        monkeypatch.setenv("MAREX_LOG_FILE", str(path))
        lg = configure_logging()
        lg.info("hello from env file")
        for h in lg.handlers:
            h.flush()
        assert path.exists() and "hello from env file" in path.read_text()


class TestFileHandler:
    def test_rotating_handler_params(self, tmp_path):
        path = tmp_path / "rot.log"
        lg = configure_logging(log_file=str(path), max_file_size_mb=1, backup_count=2)
        fhs = [h for h in lg.handlers if isinstance(h, logging.handlers.RotatingFileHandler)]
        assert len(fhs) == 1
        assert fhs[0].maxBytes == 1 * 1024 * 1024
        assert fhs[0].backupCount == 2

    def test_reconfiguration_is_idempotent(self, tmp_path):
        lg1 = configure_logging(log_file=str(tmp_path / "a.log"))
        n1 = len(lg1.handlers)
        lg2 = configure_logging(log_file=str(tmp_path / "a.log"))
        assert len(lg2.handlers) == n1  # handlers reset, not accumulated

    def test_file_gets_verbose_format(self, tmp_path):
        path = tmp_path / "fmt.log"
        lg = configure_logging(quiet=True, log_file=str(path))
        lg.error("formatted entry")
        for h in lg.handlers:
            h.flush()
        text = path.read_text()
        assert "formatted entry" in text


class TestTimingAndMemory:
    def test_log_timing_records_duration(self, caplog):
        lg = get_logger("marex_tpu.test_timing")
        with caplog.at_level(logging.INFO, logger="marex_tpu"):
            with log_timing(lg, "unit-op"):
                sum(range(1000))
        joined = " ".join(r.message for r in caplog.records)
        assert "unit-op" in joined

    def test_log_memory_usage(self, caplog):
        lg = get_logger("marex_tpu.test_mem")
        with caplog.at_level(logging.INFO, logger="marex_tpu"):
            log_memory_usage(lg, "checkpoint")
        assert any("checkpoint" in r.message for r in caplog.records)

    def test_log_function_call_decorator(self, caplog):
        lg = get_logger("marex_tpu.test_decor")

        @log_function_call(lg, level=logging.INFO)
        def add(a, b):
            return a + b

        with caplog.at_level(logging.INFO, logger="marex_tpu"):
            assert add(2, 3) == 5
        assert any("add" in r.message for r in caplog.records)

    def test_log_dask_info_reports_shape(self, caplog):
        from marex_tpu.core.field import Field

        lg = get_logger("marex_tpu.test_arr")
        f = Field(np.zeros((4, 5)), ("a", "b"), name="probe")
        with caplog.at_level(logging.DEBUG, logger="marex_tpu"):
            log_dask_info(lg, f, "probe")
        joined = " ".join(r.message for r in caplog.records)
        assert "probe" in joined


class TestProgressLogger:
    def test_progress_throttles(self, caplog):
        set_normal_logging()
        logging.getLogger("marex_tpu").propagate = True
        lg = get_logger("marex_tpu.test_prog")
        with caplog.at_level(logging.INFO, logger="marex_tpu"):
            p = ProgressLogger(lg, total=100, label="work", every=50)
            for _ in range(100):
                p.update()
        msgs = [r.message for r in caplog.records if "work" in r.message]
        assert len(msgs) == 2  # at 50 and 100
        assert "100/100" in msgs[-1]

    def test_progress_quiet_suppressed(self, caplog):
        set_quiet_mode()
        logging.getLogger("marex_tpu").propagate = True
        lg = get_logger("marex_tpu.test_prog2")
        with caplog.at_level(logging.INFO, logger="marex_tpu"):
            p = ProgressLogger(lg, total=10, label="silent", every=1)
            for _ in range(10):
                p.update()
        assert not any("silent" in r.message for r in caplog.records)
        set_normal_logging()


class TestFormats:
    def test_quiet_format_is_bare(self, tmp_path, capsys):
        lg = configure_logging(quiet=True)
        fmt = [h.formatter._fmt for h in lg.handlers if not isinstance(h, logging.handlers.RotatingFileHandler)][0]
        assert fmt == "%(levelname)s: %(message)s"

    def test_verbose_format_has_location(self):
        lg = configure_logging(verbose=True)
        fmt = [h.formatter._fmt for h in lg.handlers][0]
        assert "%(filename)s" in fmt and "%(lineno)d" in fmt

    def test_normal_format_has_timestamp_and_name(self):
        lg = configure_logging()
        fmt = [h.formatter._fmt for h in lg.handlers][0]
        assert "%(asctime)s" in fmt and "%(name)s" in fmt
        assert "%(filename)s" not in fmt

    def test_file_handler_always_verbose_format(self, tmp_path):
        lg = configure_logging(quiet=True, log_file=str(tmp_path / "f.log"))
        fh = [h for h in lg.handlers if isinstance(h, logging.handlers.RotatingFileHandler)][0]
        assert "%(filename)s" in fh.formatter._fmt


class TestEnvFlagParsing:
    @pytest.mark.parametrize("val", ["1", "true", "yes", "on", "TRUE", " Yes "])
    def test_truthy(self, val, monkeypatch):
        monkeypatch.setenv("MAREX_VERBOSE", val)
        configure_logging()
        assert is_verbose_mode()

    @pytest.mark.parametrize("val", ["0", "false", "no", "off", "", "2"])
    def test_falsy(self, val, monkeypatch):
        monkeypatch.setenv("MAREX_VERBOSE", val)
        configure_logging()
        assert not is_verbose_mode()

    def test_invalid_log_level_falls_back(self, monkeypatch):
        monkeypatch.setenv("MAREX_LOG_LEVEL", "chatty")
        lg = configure_logging()
        assert lg.level == logging.INFO  # normal-mode default


class TestRotationBehaviour:
    def test_file_actually_rotates(self, tmp_path):
        """Write past maxBytes and verify backup files appear (the reference
        pins real rollover, tests/test_logging_system.py)."""
        path = tmp_path / "rot.log"
        lg = configure_logging(log_file=str(path), max_file_size_mb=1, backup_count=2)
        fh = [h for h in lg.handlers if isinstance(h, logging.handlers.RotatingFileHandler)][0]
        fh.maxBytes = 4096  # shrink so the test stays fast
        payload = "x" * 512
        for _ in range(40):
            lg.warning(payload)
        for h in lg.handlers:
            h.flush()
        backups = sorted(tmp_path.glob("rot.log.*"))
        assert path.exists() and len(backups) >= 1
        assert len(backups) <= 2  # backup_count respected
        configure_logging()  # release handles

    def test_reconfigure_closes_previous_file(self, tmp_path):
        configure_logging(log_file=str(tmp_path / "one.log"))
        lg = configure_logging(log_file=str(tmp_path / "two.log"))
        fhs = [h for h in lg.handlers if isinstance(h, logging.handlers.RotatingFileHandler)]
        assert len(fhs) == 1 and fhs[0].baseFilename.endswith("two.log")


class TestTimingDepth:
    def test_log_timing_reports_memory_delta(self, caplog):
        lg = get_logger("marex_tpu.test_timing_mem")
        with caplog.at_level(logging.INFO, logger="marex_tpu"):
            with log_timing(lg, "mem-op", log_memory=True):
                _ = np.zeros(1000)
        done = [r.message for r in caplog.records if "mem-op" in r.message][-1]
        assert "host mem" in done and "MB" in done

    def test_log_timing_show_progress_start_line(self, caplog):
        set_normal_logging()
        logging.getLogger("marex_tpu").propagate = True
        lg = get_logger("marex_tpu.test_timing_prog")
        with caplog.at_level(logging.INFO, logger="marex_tpu"):
            with log_timing(lg, "staged-op", show_progress=True):
                pass
        msgs = [r.message for r in caplog.records]
        assert any(m.startswith("Starting: staged-op") for m in msgs)
        assert any(m.startswith("Completed: staged-op") for m in msgs)

    def test_log_timing_survives_exception(self, caplog):
        lg = get_logger("marex_tpu.test_timing_exc")
        with caplog.at_level(logging.INFO, logger="marex_tpu"):
            with pytest.raises(ValueError):
                with log_timing(lg, "failing-op"):
                    raise ValueError("boom")
        assert any("failing-op" in r.message for r in caplog.records)

    def test_log_function_call_times_and_propagates_errors(self, caplog):
        lg = get_logger("marex_tpu.test_decor2")

        @log_function_call(lg, level=logging.INFO)
        def explode():
            raise RuntimeError("nope")

        with caplog.at_level(logging.INFO, logger="marex_tpu"):
            with pytest.raises(RuntimeError):
                explode()
        joined = " ".join(r.message for r in caplog.records)
        assert "Finished" in joined and "explode" in joined


class TestLoggerHierarchy:
    def test_get_logger_prefixing(self):
        assert get_logger().name == "marex_tpu"
        assert get_logger("marex_tpu").name == "marex_tpu"
        assert get_logger("detect").name == "marex_tpu.detect"
        assert get_logger("marex_tpu.track").name == "marex_tpu.track"

    def test_package_logger_does_not_propagate_after_configure(self):
        lg = configure_logging()
        assert lg.propagate is False

    def test_quiet_mode_from_pipeline_kwarg(self):
        """preprocess_data(quiet=True) routes through configure_logging."""
        from marex_tpu.logging_config import configure_logging as cl

        cl(quiet=True)
        assert is_quiet_mode()
        lg = get_logger()
        assert lg.level >= logging.WARNING


class _CaptureHandler(logging.Handler):
    def __init__(self):
        super().__init__(level=logging.DEBUG)
        self.records = []

    def emit(self, record):
        self.records.append(record)


@pytest.fixture
def pkg_records():
    """Capture records on the package logger itself: configure_logging sets
    propagate=False, so pytest's caplog (root-attached) sees nothing."""
    lg = logging.getLogger("marex_tpu")
    h = _CaptureHandler()
    lg.addHandler(h)
    try:
        yield h.records
    finally:
        lg.removeHandler(h)
        configure_logging()  # restore default mode for later tests


class TestFunctionLevelVerbosity:
    """verbose/quiet kwargs on the public pipeline entry points control the
    emitted records (reference tests/test_logging_system.py
    TestFunctionLevelVerbosity / TestTrackerVerbosity)."""

    @staticmethod
    def _sst():
        from .conftest import make_gridded_sst

        return make_gridded_sst(n_years=2, ny=8, nx=16, seed=5)

    def test_preprocess_verbose_kwarg_switches_mode(self):
        import marex_tpu as marEx
        from marex_tpu.logging_config import is_verbose_mode

        marEx.preprocess_data(
            self._sst(), method_anomaly="fixed_baseline",
            method_extreme="global_extreme", verbose=True,
        )
        assert is_verbose_mode()

    def test_preprocess_verbose_emits_info(self, pkg_records):
        import marex_tpu as marEx

        # configure first: the kwarg path calls configure_logging, which
        # rebuilds the package handler list and would drop the capture handler
        configure_logging(verbose=True)
        lg = logging.getLogger("marex_tpu")
        h = _CaptureHandler()
        lg.addHandler(h)
        try:
            marEx.preprocess_data(
                self._sst(), method_anomaly="fixed_baseline",
                method_extreme="global_extreme",
            )
        finally:
            lg.removeHandler(h)
        infos = [r for r in h.records if r.levelno == logging.INFO]
        assert infos
        joined = " ".join(r.message.lower() for r in h.records)
        assert "anomal" in joined or "extreme" in joined

    def test_preprocess_quiet_emits_no_info(self, pkg_records):
        import marex_tpu as marEx

        marEx.preprocess_data(
            self._sst(), method_anomaly="fixed_baseline",
            method_extreme="global_extreme", quiet=True,
        )
        # quiet mode raises the package threshold to WARNING: the INFO calls
        # are filtered at the logger before any handler sees them
        assert not [r for r in pkg_records if r.levelno <= logging.INFO]

    def test_tracker_initialisation_verbose(self, pkg_records):
        import pandas as pd

        import marex_tpu as marEx
        from marex_tpu.core.field import Field

        T, NY, NX = 4, 10, 20
        da = Field(
            np.ones((T, NY, NX), bool), ("time", "lat", "lon"),
            coords={"time": pd.date_range("2020-01-01", periods=T).to_numpy(),
                    "lat": np.linspace(-10, 10, NY), "lon": np.linspace(0, 360, NX, endpoint=False)},
        )
        m = Field(np.ones((NY, NX), bool), ("lat", "lon"),
                  coords={"lat": np.linspace(-10, 10, NY), "lon": np.linspace(0, 360, NX, endpoint=False)})
        configure_logging(verbose=True)
        lg = logging.getLogger("marex_tpu")
        h = _CaptureHandler()
        lg.addHandler(h)
        try:
            marEx.tracker(da, m, R_fill=1, T_fill=0, area_filter_quartile=0.5)
        finally:
            lg.removeHandler(h)
        joined = " ".join(r.message for r in h.records)
        assert "tracker" in joined.lower() or "R_fill" in joined


class TestProgressBarHelpers:
    """Reference-parity progress helpers (marEx/logging_config.py:343-445)."""

    def test_create_progress_bar_returns_bar(self):
        from marex_tpu.logging_config import create_progress_bar, set_normal_logging

        set_normal_logging()
        pbar = create_progress_bar(total=10, desc="t", unit="x")
        try:
            assert pbar is not None
            assert pbar.total == 10
        finally:
            if pbar is not None:
                pbar.close()

    def test_create_progress_bar_quiet_returns_none(self):
        from marex_tpu.logging_config import create_progress_bar, set_normal_logging, set_quiet_mode

        set_quiet_mode()
        try:
            assert create_progress_bar(total=5) is None
        finally:
            set_normal_logging()

    def test_create_progress_bar_explicit_disable(self):
        from marex_tpu.logging_config import create_progress_bar

        assert create_progress_bar(total=5, disable=True) is None

    def test_progress_bar_context_updates(self):
        from marex_tpu.logging_config import progress_bar, set_normal_logging

        set_normal_logging()
        with progress_bar(total=3, desc="work") as pbar:
            for _ in range(3):
                if pbar:
                    pbar.update(1)
        # tqdm instance is closed on exit
        if pbar is not None:
            assert pbar.disable or pbar.n == 3

    def test_progress_bar_logger_fallback(self, caplog):
        from marex_tpu.logging_config import progress_bar, set_normal_logging, set_quiet_mode

        lg = logging.getLogger("marex_tpu.progress_test")
        set_normal_logging()
        # force the no-bar path via quiet, then check quiet suppresses the fallback
        set_quiet_mode()
        try:
            with caplog.at_level(logging.INFO, logger="marex_tpu.progress_test"):
                with progress_bar(total=2, desc="fallback-op", logger=lg) as pbar:
                    assert pbar is None
            assert "fallback-op" not in caplog.text
        finally:
            set_normal_logging()

    def test_log_progress_milestones(self):
        from marex_tpu.logging_config import log_progress, set_normal_logging

        set_normal_logging()
        lg = logging.getLogger("marex_tpu.progress_test2")
        h = _CaptureHandler()
        lg.addHandler(h)
        try:
            log_progress(lg, 5, 10, operation="halfway", frequency=10)
            log_progress(lg, 10, 10, operation="done-op")
        finally:
            lg.removeHandler(h)
        joined = " ".join(r.getMessage() for r in h.records)
        assert "halfway" in joined
        assert "done-op" in joined
        assert "100%" in joined

    def test_log_progress_quiet_and_zero_total(self, caplog):
        from marex_tpu.logging_config import log_progress, set_normal_logging, set_quiet_mode

        lg = logging.getLogger("marex_tpu.progress_test3")
        set_quiet_mode()
        try:
            with caplog.at_level(logging.DEBUG, logger="marex_tpu.progress_test3"):
                log_progress(lg, 5, 10, operation="hidden")
        finally:
            set_normal_logging()
        assert "hidden" not in caplog.text
        log_progress(lg, 1, 0, operation="empty")  # no crash on total=0


class TestMemoryUsageDict:
    def test_get_memory_usage_keys(self):
        from marex_tpu.logging_config import get_memory_usage

        stats = get_memory_usage()
        for key in ("rss_mb", "vms_mb", "percent", "available_mb", "device_mb"):
            assert key in stats, key
            assert isinstance(stats[key], float)
        assert stats["rss_mb"] > 0  # a live process has nonzero RSS


class TestSetupLoggingAlias:
    def test_setup_logging_alias(self):
        from marex_tpu.logging_config import get_verbosity_level, setup_logging

        lg = setup_logging(verbose=True)
        assert lg is logging.getLogger("marex_tpu")
        assert get_verbosity_level() == "verbose"
        setup_logging(verbose=False, quiet=False)
        assert get_verbosity_level() == "normal"

    def test_set_modes_accept_bool_arg(self):
        from marex_tpu.logging_config import (
            get_verbosity_level,
            set_quiet_mode,
            set_verbose_mode,
        )

        set_verbose_mode(True)
        assert get_verbosity_level() == "verbose"
        set_verbose_mode(False)
        assert get_verbosity_level() == "normal"
        set_quiet_mode(True)
        assert get_verbosity_level() == "quiet"
        set_quiet_mode(False)
        assert get_verbosity_level() == "normal"


class TestExternalLoggers:
    def test_external_loggers_quietened(self):
        from marex_tpu.logging_config import configure_logging

        configure_logging()
        assert logging.getLogger("matplotlib.font_manager").level == logging.ERROR
        assert logging.getLogger("PIL.PngImagePlugin").level == logging.ERROR


class TestProgressBars:
    """Progress-bar helpers (reference tests/test_logging_system.py:456-545)."""

    def test_create_progress_bar_updates_and_closes(self):
        from marex_tpu.logging_config import create_progress_bar

        bar = create_progress_bar(total=5, desc="t")
        if bar is not None:  # tqdm importable, not quiet
            for _ in range(5):
                bar.update(1)
            assert bar.n == 5
            bar.close()

    def test_create_progress_bar_quiet_returns_none(self):
        from marex_tpu.logging_config import create_progress_bar, set_normal_logging, set_quiet_mode

        set_quiet_mode()
        try:
            assert create_progress_bar(total=3, desc="t") is None
        finally:
            set_normal_logging()

    def test_create_progress_bar_disable_flag(self):
        from marex_tpu.logging_config import create_progress_bar

        assert create_progress_bar(total=3, desc="t", disable=True) is None

    def test_progress_bar_context(self):
        from marex_tpu.logging_config import progress_bar

        with progress_bar(total=4, desc="work") as bar:
            for _ in range(4):
                if bar is not None:
                    bar.update(1)

    def test_progress_bar_context_logger_fallback(self, caplog):
        import logging

        from marex_tpu.logging_config import get_logger, progress_bar, set_normal_logging, set_quiet_mode

        logger = get_logger("marex_tpu.test_progress")
        # quiet mode: no bar AND no fallback log line
        set_quiet_mode()
        try:
            with caplog.at_level(logging.INFO, logger="marex_tpu.test_progress"):
                with progress_bar(total=2, desc="quietwork", logger=logger) as bar:
                    assert bar is None
            assert not any("quietwork" in r.message for r in caplog.records)
        finally:
            set_normal_logging()

    def test_log_progress(self, caplog):
        import logging

        from marex_tpu.logging_config import get_logger, log_progress

        logger = get_logger("marex_tpu.test_progress")
        with caplog.at_level(logging.INFO, logger="marex_tpu.test_progress"):
            log_progress(logger, 5, 10, operation="halfway")
        assert any("halfway" in r.message for r in caplog.records)

    def test_log_progress_quiet_suppressed(self, caplog):
        import logging

        from marex_tpu.logging_config import get_logger, log_progress, set_normal_logging, set_quiet_mode

        logger = get_logger("marex_tpu.test_progress")
        set_quiet_mode()
        try:
            with caplog.at_level(logging.INFO, logger="marex_tpu.test_progress"):
                log_progress(logger, 10, 10, operation="suppressed-op")
            assert not any("suppressed-op" in r.message for r in caplog.records)
        finally:
            set_normal_logging()


class TestFunctionLevelVerbosity:
    """verbose/quiet kwargs on the public entry points control log volume
    (reference tests/test_logging_system.py:142-253)."""

    @pytest.fixture()
    def small_sst(self):
        import pandas as pd

        rng = np.random.default_rng(0)
        T, H, W = 365, 12, 24
        times = pd.date_range("2005-01-01", periods=T, freq="D").to_numpy()
        sst = (15 + rng.standard_normal((T, H, W))).astype(np.float32)
        return marEx.Field(
            sst, ("time", "lat", "lon"),
            {"time": times, "lat": np.linspace(-40, 40, H), "lon": np.linspace(0, 360, W, endpoint=False)},
            name="sst",
        )

    def test_preprocess_quiet_suppresses_info(self, small_sst, capfd):
        marEx.preprocess_data(small_sst, method_anomaly="fixed_baseline", method_extreme="global_extreme", quiet=True)
        err = capfd.readouterr().err
        assert not any(" INFO " in ln or "- INFO -" in ln for ln in err.splitlines() if "marex_tpu" in ln)

    def test_preprocess_normal_logs_stages(self, small_sst, capfd):
        # the package logger has its own handlers (propagate=False), so
        # assert on the actual stderr stream rather than caplog
        from marex_tpu.logging_config import set_normal_logging

        set_normal_logging()
        marEx.preprocess_data(small_sst, method_anomaly="fixed_baseline", method_extreme="global_extreme")
        err = capfd.readouterr().err.lower()
        assert "preprocessing" in err or "anomaly" in err
