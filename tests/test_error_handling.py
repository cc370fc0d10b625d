"""Error-path tests across the public API.

Mirrors the reference's error-handling coverage (tests/test_error_handling.py):
every user-facing misuse produces a typed MarExError with actionable
suggestions, never a bare exception.
"""

import numpy as np
import pandas as pd
import pytest

import marex_tpu as marEx
from marex_tpu.core.field import Field

from .conftest import make_gridded_sst


@pytest.fixture(scope="module")
def sst():
    return make_gridded_sst(n_years=3, ny=10, nx=20, seed=2)


def _expect(excinfo, *needles):
    msg = str(excinfo.value)
    for n in needles:
        assert n.lower() in msg.lower(), f"missing '{n}' in: {msg}"
    assert excinfo.value.suggestions, "error should carry suggestions"


class TestDetectErrors:
    def test_unknown_anomaly_method(self, sst):
        with pytest.raises(marEx.ConfigurationError) as e:
            marEx.compute_normalised_anomaly(sst, method_anomaly="bogus")
        _expect(e, "Unknown anomaly method")

    def test_unknown_extreme_method(self, sst):
        with pytest.raises(marEx.ConfigurationError) as e:
            marEx.identify_extremes(sst, method_extreme="bogus")
        _expect(e, "Unknown extreme method")

    def test_unknown_percentile_method(self, sst):
        with pytest.raises(marEx.ConfigurationError) as e:
            marEx.identify_extremes(sst, method_percentile="bogus")
        _expect(e, "method_percentile")

    def test_precision_with_exact(self, sst):
        with pytest.raises(marEx.ConfigurationError) as e:
            marEx.identify_extremes(sst, method_percentile="exact", precision=0.1)
        _expect(e, "precision", "exact")

    def test_max_anomaly_with_exact(self, sst):
        with pytest.raises(marEx.ConfigurationError) as e:
            marEx.identify_extremes(sst, method_percentile="exact", max_anomaly=3.0)
        _expect(e, "max_anomaly")

    def test_missing_dims(self, sst):
        with pytest.raises(marEx.DataValidationError) as e:
            marEx.preprocess_data(sst, method_anomaly="fixed_baseline", dimensions={"time": "t0", "x": "lon", "y": "lat"})
        _expect(e, "Missing required dimensions")

    def test_missing_coords(self, sst):
        with pytest.raises(marEx.DataValidationError) as e:
            marEx.preprocess_data(
                sst,
                method_anomaly="fixed_baseline",
                coordinates={"time": "time", "x": "LONGITUDE", "y": "lat"},
            )
        _expect(e, "Missing required coordinates")

    def test_all_nan_dataset(self):
        times = pd.date_range("2000-01-01", periods=40, freq="D").to_numpy()
        da = Field(
            np.full((40, 4, 6), np.nan, np.float32),
            ("time", "lat", "lon"),
            coords={"time": times, "lat": np.arange(4.0), "lon": np.arange(6.0)},
        )
        with pytest.raises(marEx.DataValidationError) as e:
            marEx.preprocess_data(da, method_anomaly="fixed_baseline")
        _expect(e, "no valid")

    def test_detrend_orders_validation(self, sst):
        with pytest.raises(marEx.ConfigurationError):
            marEx.compute_normalised_anomaly(sst, method_anomaly="detrend_harmonic", detrend_orders=[])
        with pytest.raises(marEx.ConfigurationError):
            marEx.compute_normalised_anomaly(sst, method_anomaly="detrend_harmonic", detrend_orders=[-1])

    def test_raw_array_without_dims(self):
        with pytest.raises(marEx.DataValidationError) as e:
            marEx.preprocess_data(np.zeros((5, 4, 3)), method_anomaly="fixed_baseline")
        _expect(e, "dims")


class TestTrackErrors:
    def _da_mask(self):
        T, NY, NX = 5, 10, 200
        times = pd.date_range("2020-01-01", periods=T, freq="D").to_numpy()
        coords = {"time": times, "lat": np.linspace(-5, 5, NY), "lon": np.linspace(0, 360, NX, endpoint=False)}
        data = np.zeros((T, NY, NX), bool)
        data[:, 4:7, 50:60] = True
        da = Field(data, ("time", "lat", "lon"), coords=coords)
        mask = Field(np.ones((NY, NX), bool), ("lat", "lon"), coords={"lat": coords["lat"], "lon": coords["lon"]})
        return da, mask

    def test_float_input_rejected(self):
        da, mask = self._da_mask()
        with pytest.raises(marEx.DataValidationError) as e:
            marEx.tracker(da.astype(np.float32), mask, R_fill=2, area_filter_quartile=0.5)
        _expect(e, "binary")

    def test_float_mask_rejected(self):
        da, mask = self._da_mask()
        with pytest.raises(marEx.DataValidationError) as e:
            marEx.tracker(da, mask.astype(np.float32), R_fill=2, area_filter_quartile=0.5)
        _expect(e, "Mask must be binary")

    def test_odd_t_fill(self):
        da, mask = self._da_mask()
        with pytest.raises(marEx.ConfigurationError) as e:
            marEx.tracker(da, mask, R_fill=2, T_fill=1, area_filter_quartile=0.5)
        _expect(e, "T_fill must be even")

    def test_negative_absolute_filter(self):
        da, mask = self._da_mask()
        with pytest.raises(marEx.ConfigurationError) as e:
            marEx.tracker(da, mask, R_fill=2, area_filter_absolute=-5)
        _expect(e, "area_filter_absolute")

    def test_bad_grid_resolution(self):
        da, mask = self._da_mask()
        with pytest.raises(marEx.DataValidationError) as e:
            marEx.tracker(da, mask, R_fill=2, area_filter_quartile=0.5, grid_resolution=-1.0)
        _expect(e, "grid_resolution")

    def test_grid_resolution_on_unstructured_rejected(self):
        da, mask = self._da_mask()
        with pytest.raises((marEx.DataValidationError, marEx.CoordinateError)):
            marEx.tracker(
                da,
                mask,
                R_fill=2,
                area_filter_quartile=0.5,
                unstructured_grid=True,
                coordinate_units="degrees",
                grid_resolution=0.5,
            )

    def test_bad_coordinate_units(self):
        da, mask = self._da_mask()
        with pytest.raises(marEx.CoordinateError) as e:
            marEx.tracker(da, mask, R_fill=2, area_filter_quartile=0.5, coordinate_units="furlongs")
        _expect(e, "coordinate_units")

    def test_regional_with_unstructured_rejected(self):
        da, mask = self._da_mask()
        with pytest.raises(NotImplementedError):
            marEx.tracker(
                da, mask, R_fill=2, area_filter_quartile=0.5,
                unstructured_grid=True, regional_mode=True, coordinate_units="degrees",
            )


class TestErrorStructure:
    def test_context_round_trips(self):
        try:
            marEx.identify_extremes(
                make_gridded_sst(n_years=2, ny=4, nx=8), threshold_percentile=10, method_percentile="approximate"
            )
        except marEx.ConfigurationError as e:
            d = e.to_dict()
            assert d["error_code"] == "CONFIGURATION_ERROR"
            assert d["context"]["threshold_percentile"] == 10
        else:  # pragma: no cover
            pytest.fail("expected ConfigurationError")


class TestExceptionHierarchy:
    """Unit coverage of every exception class and factory
    (cf. marEx/exceptions.py and tests/test_error_handling.py)."""

    ALL_CLASSES = [
        (marEx.exceptions.MarExError, "MAREX_ERROR"),
        (marEx.exceptions.DataValidationError, "DATA_VALIDATION_ERROR"),
        (marEx.exceptions.CoordinateError, "COORDINATE_ERROR"),
        (marEx.exceptions.ProcessingError, "PROCESSING_ERROR"),
        (marEx.exceptions.ConfigurationError, "CONFIGURATION_ERROR"),
        (marEx.exceptions.DependencyError, "DEPENDENCY_ERROR"),
        (marEx.exceptions.TrackingError, "TRACKING_ERROR"),
        (marEx.exceptions.VisualisationError, "VISUALISATION_ERROR"),
        (marEx.exceptions.DeviceError, "DEVICE_ERROR"),
    ]

    @pytest.mark.parametrize("cls,code", ALL_CLASSES, ids=[c.__name__ for c, _ in ALL_CLASSES])
    def test_default_error_codes(self, cls, code):
        err = cls("boom")
        assert err.error_code == code
        assert isinstance(err, marEx.exceptions.MarExError)
        assert str(err) == "boom"

    def test_explicit_code_overrides_default(self):
        err = marEx.exceptions.ProcessingError("x", error_code="CUSTOM_42")
        assert err.error_code == "CUSTOM_42"

    def test_formatting_includes_all_sections(self):
        err = marEx.exceptions.ConfigurationError(
            "Bad parameter",
            details="R_fill must be non-negative",
            suggestions=["Use R_fill >= 0", "See the docs"],
            context={"R_fill": -3},
        )
        text = str(err)
        assert "Bad parameter" in text
        assert "Details: R_fill must be non-negative" in text
        assert "Suggestions:" in text and "- Use R_fill >= 0" in text
        assert "Context:" in text and "R_fill=-3" in text

    def test_to_dict_round_trip(self):
        err = marEx.exceptions.TrackingError(
            "march failed", suggestions=["lower threshold"], context={"step": 7}
        )
        d = err.to_dict()
        assert d["type"] == "TrackingError"
        assert d["message"] == "march failed"
        assert d["suggestions"] == ["lower threshold"]
        assert d["context"] == {"step": 7}
        assert d["error_code"] == "TRACKING_ERROR"

    def test_data_validation_data_info_merges_into_context(self):
        err = marEx.exceptions.DataValidationError(
            "bad data", data_info={"shape": (3, 4)}, context={"stage": "detect"}
        )
        assert err.context["shape"] == (3, 4)
        assert err.context["stage"] == "detect"
        assert err.data_info == {"shape": (3, 4)}

    def test_tracking_error_dict_details_becomes_context(self):
        err = marEx.exceptions.TrackingError("overflow", details={"child_id": 9, "n_parents": 12})
        assert err.context["child_id"] == 9
        assert err.details is None

    def test_tracking_error_string_details_preserved(self):
        err = marEx.exceptions.TrackingError("overflow", details="child 9 has 12 parents")
        assert err.details == "child 9 has 12 parents"


class TestFactories:
    def test_create_data_validation_error(self):
        err = marEx.exceptions.create_data_validation_error(
            "bad", details="d", suggestions=["s"], data_info={"dtype": "float16"}
        )
        assert isinstance(err, marEx.exceptions.DataValidationError)
        assert err.context["dtype"] == "float16" and err.suggestions == ["s"]

    def test_create_coordinate_error(self):
        err = marEx.exceptions.create_coordinate_error("bad coord", context={"lat_range": (-95, 90)})
        assert isinstance(err, marEx.exceptions.CoordinateError)
        assert err.context["lat_range"] == (-95, 90)

    def test_create_processing_error(self):
        err = marEx.exceptions.create_processing_error("stage died", suggestions=["retry"])
        assert isinstance(err, marEx.exceptions.ProcessingError)
        assert err.suggestions == ["retry"]

    def test_create_tracking_error(self):
        err = marEx.exceptions.create_tracking_error("no overlap", details="d")
        assert isinstance(err, marEx.exceptions.TrackingError)
        assert err.details == "d"


class TestWrapException:
    def test_wraps_foreign_exception_with_cause(self):
        orig = ValueError("negative size")
        wrapped = marEx.exceptions.wrap_exception(orig)
        assert isinstance(wrapped, marEx.exceptions.ProcessingError)
        assert wrapped.__cause__ is orig
        assert wrapped.context["original_type"] == "ValueError"
        assert "negative size" in wrapped.message

    def test_passthrough_marex_error_without_message(self):
        orig = marEx.exceptions.ConfigurationError("already typed")
        assert marEx.exceptions.wrap_exception(orig) is orig

    def test_rewrap_marex_error_with_message(self):
        orig = marEx.exceptions.ConfigurationError("inner")
        wrapped = marEx.exceptions.wrap_exception(orig, message="outer view", error_class=marEx.exceptions.TrackingError)
        assert wrapped is not orig
        assert isinstance(wrapped, marEx.exceptions.TrackingError)
        assert wrapped.message == "outer view"

    def test_custom_class_and_suggestions(self):
        wrapped = marEx.exceptions.wrap_exception(
            KeyError("lat"), message="missing coordinate",
            error_class=marEx.exceptions.CoordinateError, suggestions=["add a lat coord"],
        )
        assert isinstance(wrapped, marEx.exceptions.CoordinateError)
        assert wrapped.suggestions == ["add a lat coord"]


class TestPublicExceptionSurface:
    def test_exceptions_exported_at_top_level(self):
        for name in (
            "MarExError", "DataValidationError", "CoordinateError", "ProcessingError",
            "ConfigurationError", "DependencyError", "TrackingError", "VisualisationError",
        ):
            assert hasattr(marEx, name), f"marEx.{name} missing from the public surface"

    def test_catching_base_class_catches_all(self, sst):
        with pytest.raises(marEx.MarExError):
            marEx.preprocess_data(sst, method_anomaly="nope", quiet=True)


class TestTrackerErrorDepth:
    def _blob(self, T=4):
        data = np.zeros((T, 12, 24), bool)
        data[:, 4:8, 6:12] = True
        return Field(
            data,
            ("time", "lat", "lon"),
            coords={
                "time": pd.date_range("2020-01-01", periods=T, freq="D").to_numpy(),
                "lat": np.linspace(-30, 30, 12),
                "lon": np.linspace(0, 360, 24, endpoint=False),
            },
            name="extreme_events",
        )

    def _mask(self):
        return Field(
            np.ones((12, 24), bool),
            ("lat", "lon"),
            coords={"lat": np.linspace(-30, 30, 12), "lon": np.linspace(0, 360, 24, endpoint=False)},
            name="mask",
        )

    def test_overlap_threshold_out_of_range(self):
        with pytest.raises(marEx.ConfigurationError) as ei:
            marEx.tracker(self._blob(), self._mask(), R_fill=0, area_filter_quartile=0.5,
                          overlap_threshold=1.5, quiet=True)
        _expect(ei, "overlap")

    def test_quartile_out_of_range(self):
        with pytest.raises(marEx.ConfigurationError) as ei:
            marEx.tracker(self._blob(), self._mask(), R_fill=0, area_filter_quartile=1.5, quiet=True)
        _expect(ei, "quartile")

    def test_non_boolean_input_rejected_with_context(self):
        bad = self._blob()._replace(data=self._blob().values.astype(np.float32))
        with pytest.raises(marEx.DataValidationError) as ei:
            marEx.tracker(bad, self._mask(), R_fill=0, area_filter_quartile=0.5, quiet=True)
        assert ei.value.suggestions

    def test_both_area_filters_rejected(self):
        with pytest.raises(marEx.ConfigurationError):
            marEx.tracker(self._blob(), self._mask(), R_fill=0, area_filter_quartile=0.5,
                          area_filter_absolute=10, quiet=True)


class TestExtremeMethodPreclusions:
    """Mutually-exclusive extreme-method parameters (reference
    tests/test_error_handling.py TestIdentifyExtremesConfigurationErrors)."""

    def test_low_percentile_with_approximate_rejected(self, sst):
        with pytest.raises(marEx.ConfigurationError) as ei:
            marEx.preprocess_data(
                sst, method_anomaly="fixed_baseline", method_extreme="global_extreme",
                method_percentile="approximate", threshold_percentile=40, quiet=True,
            )
        _expect(ei, "approximate", "60")

    def test_low_percentile_with_exact_allowed(self, sst):
        ds = marEx.preprocess_data(
            sst, method_anomaly="fixed_baseline", method_extreme="global_extreme",
            method_percentile="exact", threshold_percentile=40, quiet=True,
        )
        assert bool(np.asarray(ds.extreme_events.values).any())

    def test_window_spatial_with_global_extreme_rejected(self, sst):
        with pytest.raises(marEx.ConfigurationError) as ei:
            marEx.preprocess_data(
                sst, method_anomaly="fixed_baseline", method_extreme="global_extreme",
                window_spatial_hobday=5, quiet=True,
            )
        _expect(ei, "window_spatial_hobday", "hobday_extreme")

    def test_window_spatial_with_exact_percentile_rejected(self, sst):
        with pytest.raises(marEx.ConfigurationError) as ei:
            marEx.preprocess_data(
                sst, method_anomaly="fixed_baseline", method_extreme="hobday_extreme",
                method_percentile="exact", window_spatial_hobday=5, quiet=True,
            )
        _expect(ei, "window_spatial_hobday", "exact")

    def test_even_window_days_hobday_rejected(self, sst):
        with pytest.raises(marEx.ConfigurationError) as ei:
            marEx.preprocess_data(
                sst, method_anomaly="fixed_baseline", method_extreme="hobday_extreme",
                window_days_hobday=10, quiet=True,
            )
        _expect(ei, "odd")

    def test_even_window_spatial_hobday_rejected(self, sst):
        with pytest.raises(marEx.ConfigurationError) as ei:
            marEx.preprocess_data(
                sst, method_anomaly="fixed_baseline", method_extreme="hobday_extreme",
                window_days_hobday=11, window_spatial_hobday=4, quiet=True,
            )
        _expect(ei, "odd")

    def test_precision_error_names_offender(self, sst):
        with pytest.raises(marEx.ConfigurationError) as ei:
            marEx.preprocess_data(
                sst, method_anomaly="fixed_baseline", method_extreme="global_extreme",
                method_percentile="exact", precision=0.5, quiet=True,
            )
        assert ei.value.context.get("provided_precision") == 0.5


class TestInsufficientDataValidation:
    """shifting_baseline demands enough years (reference
    TestInsufficientDataValidation)."""

    def test_default_window_insufficient_years(self, sst):
        # sst spans 3 years; default window_year_baseline=15
        with pytest.raises(marEx.DataValidationError) as ei:
            marEx.preprocess_data(
                sst, method_anomaly="shifting_baseline", method_extreme="hobday_extreme",
                window_days_hobday=11, quiet=True,
            )
        _expect(ei, "insufficient", "years")

    def test_error_reports_available_and_required(self, sst):
        with pytest.raises(marEx.DataValidationError) as ei:
            marEx.preprocess_data(
                sst, method_anomaly="shifting_baseline", method_extreme="hobday_extreme",
                window_days_hobday=11, window_year_baseline=10, quiet=True,
            )
        info = ei.value.context
        assert info.get("available_years") == 3
        assert info.get("required_years") == 10

    def test_window_equal_to_span_rejected(self, sst):
        # sst spans exactly 3 years; window_year_baseline=3 passes the
        # reference's `<` guard but trims EVERY timestep — must raise a
        # clear error instead of emitting an empty dataset
        with pytest.raises(marEx.DataValidationError) as ei:
            marEx.preprocess_data(
                sst, method_anomaly="shifting_baseline", method_extreme="hobday_extreme",
                window_days_hobday=11, window_year_baseline=3, smooth_days_baseline=3, quiet=True,
            )
        _expect(ei, "insufficient", "years")
        assert ei.value.context.get("required_years") == 4

    def test_window_equal_to_span_rejected_streamed(self, sst, tmp_path):
        with pytest.raises(marEx.DataValidationError):
            marEx.preprocess_data_streamed(
                sst, str(tmp_path / "out.zarr"),
                method_anomaly="shifting_baseline", method_extreme="hobday_extreme",
                window_days_hobday=11, window_year_baseline=3, smooth_days_baseline=3,
            )

    def test_small_custom_window_accepted(self, sst):
        ds = marEx.preprocess_data(
            sst, method_anomaly="shifting_baseline", method_extreme="hobday_extreme",
            window_days_hobday=11, window_year_baseline=2, smooth_days_baseline=3, quiet=True,
        )
        # the first window_year_baseline years are trimmed from the output
        assert ds.extreme_events.sizes[ds.extreme_events.dims[0]] < sst.sizes["time"]


class TestRegionalCoordinateUnits:
    """regional_mode coordinate-unit validation (reference
    TestTrackerCoordinateErrors)."""

    @staticmethod
    def _binary(T=4, NY=12, NX=24):
        rng = np.random.default_rng(11)
        da = Field(
            rng.random((T, NY, NX)) > 0.7,
            ("time", "lat", "lon"),
            coords={
                "time": pd.date_range("2020-01-01", periods=T, freq="D").to_numpy(),
                "lat": np.linspace(30, 60, NY),
                "lon": np.linspace(-20, 30, NX),
            },
            name="extreme_events",
        )
        m = Field(
            np.ones((NY, NX), bool), ("lat", "lon"),
            coords={"lat": np.linspace(30, 60, NY), "lon": np.linspace(-20, 30, NX)},
        )
        return da, m

    def test_regional_requires_units(self):
        da, m = self._binary()
        with pytest.raises(marEx.MarExError) as ei:
            marEx.tracker(
                da, m, R_fill=1, T_fill=0, area_filter_quartile=0.5,
                regional_mode=True,
            )
        _expect(ei, "coordinate_units")

    def test_regional_invalid_units(self):
        da, m = self._binary()
        with pytest.raises(marEx.MarExError) as ei:
            marEx.tracker(
                da, m, R_fill=1, T_fill=0, area_filter_quartile=0.5,
                regional_mode=True, coordinate_units="furlongs",
            )
        _expect(ei, "degrees", "radians")

    def test_global_invalid_units_rejected(self):
        da, m = self._binary()
        with pytest.raises(marEx.MarExError):
            marEx.tracker(
                da, m, R_fill=1, T_fill=0, area_filter_quartile=0.5,
                coordinate_units="kilometres",
            )


class TestNeighbourArrayValidation:
    @staticmethod
    def _unstr(C=64):
        lat = np.linspace(-30, 30, C)
        lon = np.linspace(0, 350, C)
        ev = Field(
            np.ones((4, C), bool), ("time", "ncells"),
            coords={"time": pd.date_range("2020-01-01", periods=4).to_numpy(),
                    "lat": ("ncells", lat), "lon": ("ncells", lon)},
        )
        m = Field(np.ones(C, bool), ("ncells",), coords={"lat": ("ncells", lat), "lon": ("ncells", lon)})
        return ev, m

    def test_wrong_leading_dim_rejected(self):
        ev, m = self._unstr()
        nb = np.full((4, 64), -1, np.int32)  # quad mesh: not (3, ncells)
        with pytest.raises(marEx.DataValidationError) as ei:
            marEx.tracker(
                ev, m, R_fill=0, area_filter_quartile=0.5, unstructured_grid=True,
                dimensions={"x": "ncells"}, coordinates={"x": "lon", "y": "lat"},
                neighbours=nb, cell_areas=np.ones(64, np.float32),
                coordinate_units="degrees",
            )
        _expect(ei, "triangular")

    def test_missing_neighbours_rejected(self):
        ev, m = self._unstr()
        with pytest.raises(marEx.DataValidationError) as ei:
            marEx.tracker(
                ev, m, R_fill=0, area_filter_quartile=0.5, unstructured_grid=True,
                dimensions={"x": "ncells"}, coordinates={"x": "lon", "y": "lat"},
                cell_areas=np.ones(64, np.float32), coordinate_units="degrees",
            )
        _expect(ei, "neighbours")

    def test_missing_cell_areas_rejected(self):
        ev, m = self._unstr()
        nb = np.full((3, 64), -1, np.int32)
        with pytest.raises(marEx.DataValidationError) as ei:
            marEx.tracker(
                ev, m, R_fill=0, area_filter_quartile=0.5, unstructured_grid=True,
                dimensions={"x": "ncells"}, coordinates={"x": "lon", "y": "lat"},
                neighbours=nb, coordinate_units="degrees",
            )
        _expect(ei, "cell_areas")


class TestHelpfulErrorMessages:
    """Every MarExError string includes details and numbered suggestions
    (reference TestHelpfulErrorMessages)."""

    def test_formatting_has_suggestions_section(self, sst):
        with pytest.raises(marEx.ConfigurationError) as ei:
            marEx.preprocess_data(sst, method_anomaly="nope", quiet=True)
        text = str(ei.value)
        assert "Suggestions:" in text
        assert "\n  - " in text  # bulleted suggestion list
        assert "Context:" in text

    def test_insufficient_data_suggests_fixes(self, sst):
        with pytest.raises(marEx.DataValidationError) as ei:
            marEx.preprocess_data(
                sst, method_anomaly="shifting_baseline", method_extreme="hobday_extreme",
                window_days_hobday=11, quiet=True,
            )
        assert any("window_year_baseline" in s for s in ei.value.suggestions)

    def test_tracker_dim_error_names_expected_dims(self):
        da = Field(
            np.ones((4, 6), bool), ("time", "lat"),
            coords={"time": pd.date_range("2020-01-01", periods=4).to_numpy(),
                    "lat": np.arange(6.0), "lon": ("lat", np.arange(6.0))},
        )
        m = Field(np.ones(6, bool), ("lat",), coords={"lat": np.arange(6.0)})
        with pytest.raises(marEx.MarExError):
            marEx.tracker(da, m, R_fill=1, area_filter_quartile=0.5)


class TestExceptionMutators:
    """Post-creation mutation API (reference marEx/exceptions.py:75-81,
    tests/test_exceptions.py:76-92)."""

    def test_add_suggestion(self):
        err = marEx.MarExError("Test error")
        assert err.suggestions == []
        err.add_suggestion("New suggestion")
        assert err.suggestions == ["New suggestion"]
        assert "New suggestion" in str(err)

    def test_add_context(self):
        err = marEx.MarExError("Test error")
        assert err.context == {}
        err.add_context("key", "value")
        assert err.context["key"] == "value"
        assert "key='value'" in str(err)

    def test_mutators_compose(self):
        err = marEx.TrackingError("boom")
        err.add_suggestion("try A")
        err.add_suggestion("try B")
        err.add_context("n", 3)
        s = str(err)
        assert "try A" in s and "try B" in s and "n=3" in s


class TestExceptionChaining:
    """``raise ... from`` preserves the original cause
    (reference tests/test_exceptions.py:237-252)."""

    def test_cause_preserved(self):
        try:
            try:
                raise ValueError("original")
            except ValueError as e:
                raise marEx.ProcessingError("wrapped", details="ctx") from e
        except marEx.ProcessingError as err:
            assert isinstance(err.__cause__, ValueError)
            assert str(err.__cause__) == "original"

    def test_wrap_exception_sets_cause(self):
        from marex_tpu.exceptions import wrap_exception

        try:
            raise RuntimeError("low level")
        except RuntimeError as e:
            wrapped = wrap_exception(e, "higher-level context")
        assert isinstance(wrapped, marEx.MarExError)
        assert wrapped.__cause__ is None or isinstance(wrapped.__cause__, RuntimeError)
        assert "higher-level context" in str(wrapped) or "low level" in str(wrapped)


class TestErrorMessageQuality:
    """Errors raised by the pipeline must carry actionable suggestions and
    debugging context (reference tests/test_exceptions.py:254-288)."""

    def test_pipeline_errors_have_suggestions_and_context(self, sst):
        try:
            marEx.preprocess_data(sst, method_anomaly="not_a_method")
        except marEx.ConfigurationError as err:
            assert len(err.suggestions) >= 1
            assert all(isinstance(s, str) and len(s) > 10 for s in err.suggestions)
            assert err.context  # names the offending value
            assert err.error_code
        else:
            raise AssertionError("expected ConfigurationError")

    def test_tracking_error_context_names_counts(self):
        import numpy as np
        import pandas as pd

        from marex_tpu import Field

        T, H, W = 8, 16, 32
        times = pd.date_range("2001-01-01", periods=T, freq="D").to_numpy()
        ev = Field(
            np.zeros((T, H, W), bool), ("time", "lat", "lon"),
            {"time": times, "lat": np.linspace(-50, 50, H), "lon": np.linspace(0, 360, W, endpoint=False)},
            name="extreme_events",
        )
        mask = Field(np.ones((H, W), bool), ("lat", "lon"), {"lat": ev.coords["lat"], "lon": ev.coords["lon"]}, name="mask")
        tr = marEx.tracker(ev, mask, R_fill=1, T_fill=0, area_filter_quartile=0.5, allow_merging=False, quiet=True)
        with pytest.raises(marEx.TrackingError) as ei:
            tr.run()
        assert ei.value.context.get("objects_count") == 0
        assert len(ei.value.suggestions) >= 2
