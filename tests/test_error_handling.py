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
