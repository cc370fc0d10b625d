"""Error-path depth tests: exception-class contracts for every factory,
tracker mask/coordinate validations, direct detect-helper validation, and
percentile edge cases (reference scope: tests/test_exceptions.py +
tests/test_error_handling.py TestTrackerDataValidationErrors /
TestTrackerCoordinateErrors / TestEdgeCasesAndBoundaryConditions)."""

import numpy as np
import pandas as pd
import pytest

import marex_tpu as marEx
from marex_tpu.core.field import Coord, Field
from marex_tpu.exceptions import (
    ConfigurationError,
    CoordinateError,
    DataValidationError,
    DependencyError,
    DeviceError,
    MarExError,
    ProcessingError,
    TrackingError,
    VisualisationError,
    create_coordinate_error,
    create_data_validation_error,
    create_processing_error,
    create_tracking_error,
    wrap_exception,
)


def _binary_field(T=10, H=8, W=16, fill=True):
    data = np.zeros((T, H, W), bool)
    if fill:
        data[:, 2:5, 3:8] = True
    coords = {
        "time": pd.date_range("2020-01-01", periods=T, freq="D").to_numpy(),
        "lat": np.linspace(-40, 40, H),
        "lon": np.linspace(0, 360, W, endpoint=False),
    }
    return Field(data, ("time", "lat", "lon"), coords, name="extreme_events")


def _mask(H=8, W=16, value=True):
    return Field(
        np.full((H, W), value, bool),
        ("lat", "lon"),
        {"lat": np.linspace(-40, 40, H), "lon": np.linspace(0, 360, W, endpoint=False)},
        name="mask",
    )


class TestFactoryContracts:
    """Every factory must produce its class, its stable error_code, the given
    suggestions, and a context that round-trips through to_dict()."""

    CASES = [
        (create_data_validation_error, DataValidationError, "DATA_VALIDATION_ERROR"),
        (create_coordinate_error, CoordinateError, "COORDINATE_ERROR"),
        (create_processing_error, ProcessingError, "PROCESSING_ERROR"),
        (create_tracking_error, TrackingError, "TRACKING_ERROR"),
    ]

    @pytest.mark.parametrize("factory,cls,code", CASES)
    def test_contract(self, factory, cls, code):
        kw = {"details": "why it failed", "suggestions": ["do this", "or that"]}
        if factory is create_data_validation_error:
            kw["data_info"] = {"shape": (3, 4)}
        else:
            kw["context"] = {"k": 1}
        err = factory("boom", **kw)
        assert isinstance(err, cls)
        assert isinstance(err, MarExError)
        assert err.error_code == code
        assert err.details == "why it failed"
        assert err.suggestions == ["do this", "or that"]
        d = err.to_dict()
        assert d["type"] == cls.__name__
        assert d["error_code"] == code
        assert d["message"] == "boom"
        # context payload present under either key scheme
        assert d["context"]

    @pytest.mark.parametrize("factory,cls,code", CASES)
    def test_message_formatting_sections(self, factory, cls, code):
        err = factory("headline", details="details text", suggestions=["tip"])
        s = str(err)
        assert "headline" in s
        assert "Details: details text" in s
        assert "- tip" in s

    def test_every_class_has_distinct_default_code(self):
        classes = [
            MarExError, DataValidationError, CoordinateError, ProcessingError,
            ConfigurationError, DependencyError, TrackingError,
            VisualisationError, DeviceError,
        ]
        codes = [c.default_error_code for c in classes]
        assert len(set(codes)) == len(codes)

    def test_wrap_exception_preserves_cause_and_type_context(self):
        try:
            raise ValueError("inner")
        except ValueError as e:
            wrapped = wrap_exception(e, message="outer", error_class=TrackingError)
        assert isinstance(wrapped, TrackingError)
        assert wrapped.__cause__.args == ("inner",)
        assert wrapped.context["original_type"] == "ValueError"


class TestTrackerMaskValidation:
    def test_all_false_mask_rejected(self):
        with pytest.raises(DataValidationError) as ei:
            marEx.tracker(_binary_field(), _mask(value=False), R_fill=2, T_fill=2,
                          area_filter_quartile=0.5, quiet=True)
        assert "only False" in str(ei.value)
        assert any("Invert" in s or "orientation" in s for s in ei.value.suggestions)

    def test_int_mask_rejected_with_dtype_info(self):
        m = _mask()
        bad = Field(m.values.astype(np.int32), m.dims, dict(m.coords), name="mask")
        with pytest.raises(DataValidationError) as ei:
            marEx.tracker(_binary_field(), bad, R_fill=2, T_fill=2,
                          area_filter_quartile=0.5, quiet=True)
        assert ei.value.context.get("mask_dtype") == "int32"

    def test_float_data_rejected_with_dtype_info(self):
        f = _binary_field()
        bad = Field(f.values.astype(np.float32), f.dims, dict(f.coords), name="extreme_events")
        with pytest.raises(DataValidationError) as ei:
            marEx.tracker(bad, _mask(), R_fill=2, T_fill=2,
                          area_filter_quartile=0.5, quiet=True)
        assert ei.value.context.get("actual_dtype") == "float32"
        assert ei.value.context.get("expected_dtype") == "bool"


class TestCoordinateAutodetection:
    def test_nondegree_nonradian_range_rejected(self):
        """A longitude span of ~10 units is neither ~360 deg nor ~2pi rad:
        global-mode unit autodetection must fail with the detected range in
        context (reference test_global_mode_coordinate_autodetection_failure)."""
        f = _binary_field()
        weird = Field(
            f.values, f.dims,
            {
                "time": f.coords["time"].values,
                "lat": np.linspace(0, 5, f.sizes["lat"]),
                "lon": np.linspace(0, 10, f.sizes["lon"], endpoint=False),
            },
            name="extreme_events",
        )
        m = Field(
            np.ones((f.sizes["lat"], f.sizes["lon"]), bool), ("lat", "lon"),
            {"lat": weird.coords["lat"].values, "lon": weird.coords["lon"].values}, name="mask",
        )
        with pytest.raises(CoordinateError) as ei:
            marEx.tracker(weird, m, R_fill=2, T_fill=2, area_filter_quartile=0.5, quiet=True)
        assert "detected_range" in ei.value.context
        assert any("coordinate_units" in s for s in ei.value.suggestions)

    def test_radian_coordinates_autodetected(self):
        f = _binary_field()
        rad = Field(
            f.values, f.dims,
            {
                "time": f.coords["time"].values,
                "lat": np.deg2rad(f.coords["lat"].values),
                "lon": np.linspace(0, 2 * np.pi, f.sizes["lon"], endpoint=False),
            },
            name="extreme_events",
        )
        m = Field(
            np.ones((f.sizes["lat"], f.sizes["lon"]), bool), ("lat", "lon"),
            {"lat": rad.coords["lat"].values, "lon": rad.coords["lon"].values}, name="mask",
        )
        tr = marEx.tracker(rad, m, R_fill=2, T_fill=2, area_filter_quartile=0.5, quiet=True)
        assert tr.coordinate_units == "radians"


class TestPercentileEdgeCases:
    @pytest.fixture
    def sst(self):
        rng = np.random.default_rng(0)
        T, H, W = 3 * 365, 6, 12
        data = 15 + rng.standard_normal((T, H, W)).astype(np.float32)
        coords = {
            "time": pd.date_range("2000-01-01", periods=T, freq="D").to_numpy(),
            "lat": np.linspace(-30, 30, H),
            "lon": np.linspace(0, 360, W, endpoint=False),
        }
        return Field(data, ("time", "lat", "lon"), coords, name="sst")

    def test_low_percentile_approximate_rejected(self, sst):
        with pytest.raises(ConfigurationError):
            marEx.preprocess_data(
                sst, method_anomaly="fixed_baseline", method_extreme="global_extreme",
                method_percentile="approximate", threshold_percentile=30, quiet=True,
            )

    def test_high_percentile_works(self, sst):
        ds = marEx.preprocess_data(
            sst, method_anomaly="fixed_baseline", method_extreme="global_extreme",
            method_percentile="approximate", threshold_percentile=99, quiet=True,
        )
        frac = float(np.asarray(ds.extreme_events.values).mean())
        assert 0.0 < frac < 0.05

    def test_percentile_above_100_rejected(self, sst):
        with pytest.raises((ConfigurationError, DataValidationError, ValueError)):
            marEx.preprocess_data(
                sst, method_anomaly="fixed_baseline", method_extreme="global_extreme",
                threshold_percentile=101, quiet=True,
            )

    def test_negative_percentile_rejected(self, sst):
        with pytest.raises((ConfigurationError, DataValidationError, ValueError)):
            marEx.preprocess_data(
                sst, method_anomaly="fixed_baseline", method_extreme="global_extreme",
                threshold_percentile=-5, quiet=True,
            )


class TestDirectHelperValidation:
    """compute_normalised_anomaly / identify_extremes called directly (not via
    preprocess_data) must run the same dimension/coordinate validation
    (reference test_compute_normalised_anomaly_dimension_validation etc.)."""

    @pytest.fixture
    def sst(self):
        rng = np.random.default_rng(1)
        T, H, W = 2 * 365, 6, 12
        coords = {
            "time": pd.date_range("2000-01-01", periods=T, freq="D").to_numpy(),
            "lat": np.linspace(-30, 30, H),
            "lon": np.linspace(0, 360, W, endpoint=False),
        }
        return Field(15 + rng.standard_normal((T, H, W)).astype(np.float32), ("time", "lat", "lon"), coords, name="sst")

    def test_anomaly_bad_dimension_name(self, sst):
        with pytest.raises((DataValidationError, CoordinateError, ConfigurationError)):
            marEx.compute_normalised_anomaly(
                sst, method_anomaly="fixed_baseline",
                dimensions={"time": "not_a_dim", "x": "lon", "y": "lat"},
            )

    def test_anomaly_unknown_method(self, sst):
        with pytest.raises(ConfigurationError):
            marEx.compute_normalised_anomaly(sst, method_anomaly="nope")

    def test_identify_extremes_unknown_method(self, sst):
        with pytest.raises(ConfigurationError):
            marEx.identify_extremes(sst, method_extreme="nope")

    def test_identify_extremes_bad_dimension_name(self, sst):
        with pytest.raises((DataValidationError, CoordinateError, ConfigurationError, KeyError)):
            marEx.identify_extremes(
                sst, method_extreme="global_extreme",
                dimensions={"time": "not_a_dim", "x": "lon", "y": "lat"},
            )


class TestTrackingRuntimeErrors:
    def test_zero_objects_raises_tracking_error(self):
        """An all-background field must surface the reference's clean
        TrackingError from the filter stage, on every code path."""
        f = _binary_field(fill=False)
        tr = marEx.tracker(f, _mask(), R_fill=0, T_fill=0, area_filter_quartile=0.5, quiet=True)
        with pytest.raises(TrackingError) as ei:
            tr.run()
        assert ei.value.context.get("objects_count") == 0

    def test_zero_objects_absolute_filter(self):
        f = _binary_field(fill=False)
        tr = marEx.tracker(f, _mask(), R_fill=0, T_fill=0, area_filter_absolute=5, quiet=True)
        with pytest.raises(TrackingError):
            tr.run()
