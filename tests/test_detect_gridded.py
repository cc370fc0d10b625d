"""Gridded preprocessing tests: all 4 anomaly methods x 2 extreme methods.

Statistical contract mirrors the reference's test strategy
(tests/test_gridded_preprocessing.py): extreme frequencies must match the
percentile within binomial tolerance; shapes/dtypes/attrs must match the
documented output contract.
"""

import numpy as np
import pandas as pd
import pytest

import marex_tpu as marEx

from .conftest import assert_percentile_frequency, assert_reasonable_bounds


class TestFixedBaselineGlobalExtreme:
    def test_exact(self, gridded_sst):
        ds = marEx.preprocess_data(
            gridded_sst,
            method_anomaly="fixed_baseline",
            method_extreme="global_extreme",
            method_percentile="exact",
            threshold_percentile=95,
        )
        assert set(["dat_anomaly", "mask", "extreme_events", "thresholds"]) <= set(ds.data_vars)
        assert ds.dat_anomaly.dims == ("time", "lat", "lon")
        assert ds.thresholds.dims == ("lat", "lon")
        assert ds.extreme_events.dtype == bool

        mask = ds.mask.values
        ev = ds.extreme_events.values[:, mask]
        freq = ev.mean()
        assert_percentile_frequency(freq, 95, description="fixed/global/exact")

        # anomalies at ocean points should be ~zero-mean per location
        anom = ds.dat_anomaly.values[:, mask]
        assert np.abs(np.nanmean(anom)) < 0.1

    def test_approximate_matches_exact(self, gridded_sst):
        kw = dict(method_anomaly="fixed_baseline", method_extreme="global_extreme", threshold_percentile=95)
        ds_exact = marEx.preprocess_data(gridded_sst, method_percentile="exact", **kw)
        ds_approx = marEx.preprocess_data(gridded_sst, method_percentile="approximate", **kw)
        mask = ds_exact.mask.values
        diff = np.abs(ds_exact.thresholds.values[mask] - ds_approx.thresholds.values[mask])
        # histogram precision is 0.01 -> thresholds agree to ~one bin
        assert np.nanmax(diff) < 0.05
        assert np.nanmean(diff) < 0.01

    def test_land_is_never_extreme(self, gridded_sst):
        ds = marEx.preprocess_data(
            gridded_sst, method_anomaly="fixed_baseline", method_extreme="global_extreme", method_percentile="exact"
        )
        land = ~ds.mask.values
        assert not ds.extreme_events.values[:, land].any()
        assert np.isnan(ds.thresholds.values[land]).all()


class TestHobdayExtreme:
    def test_hobday_thresholds_shape_and_freq(self, gridded_sst):
        ds = marEx.preprocess_data(
            gridded_sst,
            method_anomaly="fixed_baseline",
            method_extreme="hobday_extreme",
            method_percentile="approximate",
            threshold_percentile=95,
        )
        assert ds.thresholds.dims == ("dayofyear", "lat", "lon")
        assert ds.thresholds.sizes["dayofyear"] == 366
        mask = ds.mask.values
        freq = ds.extreme_events.values[:, mask].mean()
        # spatial window smoothing (default 5x5) biases mildly; generous tolerance
        assert 0.02 < freq < 0.09

    def test_hobday_exact_percentile_frequency(self, gridded_sst):
        ds = marEx.preprocess_data(
            gridded_sst,
            method_anomaly="fixed_baseline",
            method_extreme="hobday_extreme",
            method_percentile="exact",
            threshold_percentile=90,
        )
        mask = ds.mask.values
        freq = ds.extreme_events.values[:, mask].mean()
        assert_percentile_frequency(freq, 90, description="hobday/exact")

    def test_hobday_approx_vs_exact_thresholds(self, gridded_sst):
        kw = dict(method_anomaly="fixed_baseline", method_extreme="hobday_extreme", threshold_percentile=95)
        ds_exact = marEx.preprocess_data(gridded_sst, method_percentile="exact", **kw)
        ds_approx = marEx.preprocess_data(gridded_sst, method_percentile="approximate", window_spatial_hobday=1, **kw)
        mask = ds_exact.mask.values
        t_exact = ds_exact.thresholds.values[:, mask]
        t_approx = ds_approx.thresholds.values[:, mask]
        # same doy-window sample sets -> close thresholds
        assert np.nanmean(np.abs(t_exact - t_approx)) < 0.05

    def test_even_window_days_rejected(self, gridded_sst):
        with pytest.raises(marEx.ConfigurationError):
            marEx.preprocess_data(
                gridded_sst, method_anomaly="fixed_baseline", method_extreme="hobday_extreme", window_days_hobday=10
            )

    def test_spatial_window_with_exact_rejected(self, gridded_sst):
        with pytest.raises(marEx.ConfigurationError):
            marEx.preprocess_data(
                gridded_sst,
                method_anomaly="fixed_baseline",
                method_extreme="hobday_extreme",
                method_percentile="exact",
                window_spatial_hobday=5,
            )


class TestShiftingBaseline:
    def test_first_window_years_trimmed(self, gridded_sst):
        ds = marEx.preprocess_data(
            gridded_sst,
            method_anomaly="shifting_baseline",
            method_extreme="global_extreme",
            window_year_baseline=5,
            threshold_percentile=95,
        )
        years = np.array([np.datetime64(t, "Y").astype(int) + 1970 for t in ds.coords["time"].values])
        assert years.min() == 2005  # 2000 + 5
        mask = ds.mask.values
        anom = ds.dat_anomaly.values[:, mask]
        assert np.isfinite(anom).all()
        freq = ds.extreme_events.values[:, mask].mean()
        assert_percentile_frequency(freq, 95, description="shifting/global")

    def test_small_spatial_extent_not_nan(self):
        """Regression: the fused smooth->calendar-scatter program miscompiled
        on XLA:CPU at small spatial extents (ALL-NaN anomalies at 12x20 cells
        while 20x40 was correct) until an optimization_barrier was placed at
        the scatter input (ops/pipeline._scatter_ymd)."""
        rng = np.random.default_rng(0)
        T, H, W = 8 * 365, 12, 20
        times = pd.date_range("2000-01-01", periods=T, freq="D").to_numpy()
        da = marEx.Field(
            (15 + rng.standard_normal((T, H, W))).astype(np.float32),
            ("time", "lat", "lon"),
            {"time": times, "lat": np.linspace(35, 40, H), "lon": np.linspace(-40, -35, W)},
            name="sst",
        )
        ds = marEx.preprocess_data(
            da,
            method_anomaly="shifting_baseline",
            method_extreme="hobday_extreme",
            # 4-year window: any 4 consecutive years include a leap year, so
            # the doy-366 climatology is defined (a 3-year window starting
            # after a leap year legitimately yields NaN on Dec 31)
            window_year_baseline=4,
            smooth_days_baseline=21,
            window_days_hobday=11,
            threshold_percentile=95,
        )
        anom = ds.dat_anomaly.values
        assert np.isfinite(anom).all()
        assert ds.extreme_events.values.mean() > 0.01

    def test_insufficient_years_raises(self, gridded_sst):
        with pytest.raises(marEx.DataValidationError):
            marEx.preprocess_data(
                gridded_sst,
                method_anomaly="shifting_baseline",
                window_year_baseline=50,
            )

    def test_rolling_climatology_nan_head(self, gridded_sst):
        clim = marEx.rolling_climatology(gridded_sst, window_year_baseline=5)
        assert clim.dims == gridded_sst.dims
        assert clim.shape == gridded_sst.shape
        # first 5 years entirely NaN
        head = clim.values[: 5 * 365]
        assert np.isnan(head).all()
        # later years finite over ocean
        mask = np.isfinite(gridded_sst.values[0])
        tail = clim.values[6 * 366 :][:, mask]
        assert np.isfinite(tail).all()

    def test_rolling_climatology_values(self, gridded_sst):
        """Cross-check the causal prefix-sum formulation against brute force."""
        import pandas as pd

        clim = marEx.rolling_climatology(gridded_sst, window_year_baseline=5)
        times = pd.DatetimeIndex(gridded_sst.coords["time"].values)
        years = times.year.to_numpy()
        doys = times.dayofyear.to_numpy()
        vals = gridded_sst.values

        # pick a few (t, y, x) samples and verify against brute-force nanmean
        rng = np.random.default_rng(0)
        t_candidates = np.nonzero(years >= years.min() + 5)[0]
        for t in rng.choice(t_candidates, 5, replace=False):
            sel = (doys == doys[t]) & (years >= years[t] - 5) & (years < years[t])
            expected = np.nanmean(vals[sel], axis=0)
            got = clim.values[t]
            np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4, equal_nan=True)


class TestDetrendHarmonic:
    def test_zero_mean_and_seasonality_removed(self, gridded_sst):
        ds = marEx.preprocess_data(
            gridded_sst,
            method_anomaly="detrend_harmonic",
            method_extreme="global_extreme",
            method_percentile="exact",
        )
        mask = ds.mask.values
        anom = ds.dat_anomaly.values[:, mask]
        assert abs(np.nanmean(anom)) < 1e-3
        # seasonal cycle (amplitude ~3 at low lat) should be mostly removed:
        # per-doy means of anomalies stay well below the raw seasonal amplitude
        import pandas as pd

        doys = pd.DatetimeIndex(ds.coords["time"].values).dayofyear.to_numpy()
        doy_means = np.array([np.nanmean(anom[doys == d]) for d in range(1, 366)])
        assert np.nanmax(np.abs(doy_means)) < 0.5

    def test_std_normalise_outputs(self, gridded_sst):
        ds = marEx.preprocess_data(
            gridded_sst,
            method_anomaly="detrend_harmonic",
            method_extreme="global_extreme",
            method_percentile="exact",
            std_normalise=True,
        )
        assert "dat_stn" in ds
        assert "STD" in ds
        assert ds.STD.dims[0] == "dayofyear"
        mask = ds.mask.values
        stn = ds.dat_stn.values[:, mask]
        # standardised anomalies ~ unit variance
        assert_reasonable_bounds(float(np.nanstd(stn)), 1.0, tolerance_relative=0.2, description="stn std")

    def test_trend_removed(self):
        from .conftest import make_gridded_sst

        da = make_gridded_sst(n_years=10, ny=8, nx=16, seed=1, with_land=False)
        ds = marEx.preprocess_data(
            da, method_anomaly="detrend_harmonic", method_extreme="global_extreme", method_percentile="exact"
        )
        anom = ds.dat_anomaly.values
        T = anom.shape[0]
        # linear trend of anomalies should be ~0 (raw data has +0.02/yr)
        t = np.arange(T) / 365.25
        slope = np.polyfit(t, np.nanmean(anom, axis=(1, 2)), 1)[0]
        assert abs(slope) < 0.005

    def test_empty_detrend_orders_rejected(self, gridded_sst):
        with pytest.raises(marEx.ConfigurationError):
            marEx.preprocess_data(gridded_sst, method_anomaly="detrend_harmonic", detrend_orders=[])

    def test_negative_order_rejected(self, gridded_sst):
        with pytest.raises(marEx.ConfigurationError):
            marEx.preprocess_data(gridded_sst, method_anomaly="detrend_harmonic", detrend_orders=[0])


class TestDetrendFixedBaseline:
    def test_runs_and_reference_period(self, gridded_sst):
        ds = marEx.preprocess_data(
            gridded_sst,
            method_anomaly="detrend_fixed_baseline",
            method_extreme="global_extreme",
            method_percentile="exact",
            reference_period=(2002, 2008),
        )
        assert ds.attrs["reference_period"] == [2002, 2008]
        mask = ds.mask.values
        freq = ds.extreme_events.values[:, mask].mean()
        assert_percentile_frequency(freq, 95)

    def test_reference_period_wrong_method_rejected(self, gridded_sst):
        with pytest.raises(marEx.ConfigurationError):
            marEx.preprocess_data(gridded_sst, method_anomaly="shifting_baseline", reference_period=(2001, 2005))

    def test_reference_period_inverted_rejected(self, gridded_sst):
        with pytest.raises(marEx.ConfigurationError):
            marEx.preprocess_data(
                gridded_sst, method_anomaly="fixed_baseline", reference_period=(2010, 2001)
            )

    def test_reference_period_out_of_range_rejected(self, gridded_sst):
        with pytest.raises(marEx.ConfigurationError):
            marEx.preprocess_data(
                gridded_sst, method_anomaly="fixed_baseline", reference_period=(1900, 1910)
            )


class TestValidation:
    def test_nan_in_ocean_rejected(self, gridded_sst):
        bad = gridded_sst.copy()
        v = bad.values
        v[100, 10, 20] = np.nan  # mid-ocean NaN at t=100 (finite at t=0)
        with pytest.raises(marEx.DataValidationError):
            marEx.preprocess_data(bad, method_anomaly="fixed_baseline")

    def test_missing_dimension_rejected(self, gridded_sst):
        with pytest.raises(marEx.DataValidationError):
            marEx.preprocess_data(gridded_sst, method_anomaly="fixed_baseline", dimensions={"time": "time", "x": "XXX", "y": "lat"})

    def test_low_percentile_approximate_rejected(self, gridded_sst):
        with pytest.raises(marEx.ConfigurationError):
            marEx.preprocess_data(gridded_sst, method_anomaly="fixed_baseline", threshold_percentile=50, method_percentile="approximate")

    def test_attrs_provenance(self, gridded_sst):
        ds = marEx.preprocess_data(
            gridded_sst, method_anomaly="fixed_baseline", method_extreme="global_extreme", method_percentile="exact"
        )
        assert ds.attrs["method_anomaly"] == "fixed_baseline"
        assert ds.attrs["method_extreme"] == "global_extreme"
        assert ds.attrs["threshold_percentile"] == 95
        assert len(ds.attrs["preprocessing_steps"]) >= 2


class TestForceZeroMean:
    """Reference expectations: tests/test_gridded_preprocessing.py
    test_detrend_fixed_baseline_force_zero_mean — the detrended anomaly
    must be re-centred per cell when force_zero_mean=True, and the flag
    must be recorded in the output attrs for both detrend methods."""

    def test_detrend_fixed_baseline_force_zero_mean(self, gridded_sst):
        ds = marEx.preprocess_data(
            gridded_sst,
            method_anomaly="detrend_fixed_baseline",
            method_extreme="global_extreme",
            detrend_orders=[1, 2],
            force_zero_mean=True,
            threshold_percentile=95,
        )
        assert ds.attrs["method_anomaly"] == "detrend_fixed_baseline"
        assert list(ds.attrs["detrend_orders"]) == [1, 2]
        assert bool(ds.attrs["force_zero_mean"]) is True
        # all time steps preserved (unlike shifting_baseline)
        assert ds.sizes["time"] == gridded_sst.sizes["time"]
        mask = ds.mask.values
        anom = ds.dat_anomaly.values[:, mask]
        assert abs(float(np.nanmean(anom))) < 0.01

    def test_force_zero_mean_false_recorded(self, gridded_sst):
        ds = marEx.preprocess_data(
            gridded_sst,
            method_anomaly="detrend_harmonic",
            method_extreme="global_extreme",
            detrend_orders=[1],
            force_zero_mean=False,
            threshold_percentile=95,
        )
        assert bool(ds.attrs["force_zero_mean"]) is False
        # the harmonic design matrix contains a constant term, so the fit
        # itself removes most of the mean — but the flag flips the explicit
        # re-centring step off and must round-trip through attrs
        assert ds.sizes["time"] == gridded_sst.sizes["time"]

    def test_zero_mean_changes_anomaly(self, gridded_sst):
        kw = dict(
            method_anomaly="detrend_fixed_baseline",
            method_extreme="global_extreme",
            detrend_orders=[1],
            threshold_percentile=95,
        )
        ds_on = marEx.preprocess_data(gridded_sst, force_zero_mean=True, **kw)
        ds_off = marEx.preprocess_data(gridded_sst, force_zero_mean=False, **kw)
        mask = ds_on.mask.values
        a_on = ds_on.dat_anomaly.values[:, mask]
        a_off = ds_off.dat_anomaly.values[:, mask]
        # same shape/dtype contract either way
        assert a_on.shape == a_off.shape
        assert abs(float(np.nanmean(a_on))) < 0.01
