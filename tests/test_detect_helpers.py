"""Numerics tests for detect kernels vs numpy references.

Mirrors the reference's tests/test_detect_helpers.py: decimal year (incl.
leap years), 1-D/2-D histogram quantiles vs exact np.quantile, rolling-mean
semantics, digitize parity.
"""

import numpy as np
import pandas as pd
import pytest

import jax.numpy as jnp

from marex_tpu.core.timeaxis import decompose_time, doy_window_indices, scatter_to_year_doy
from marex_tpu.ops import climatology as mclim
from marex_tpu.ops import quantile as mquant


class TestDecimalYear:
    def test_regular_year(self):
        times = pd.to_datetime(["2001-01-01", "2001-07-02", "2001-12-31"]).to_numpy()
        dy = decompose_time(times).decimal_year
        assert dy[0] == pytest.approx(2001.0)
        assert dy[1] == pytest.approx(2001.0 + 182 / 365)
        assert dy[2] == pytest.approx(2001.0 + 364 / 365)

    def test_leap_year(self):
        times = pd.to_datetime(["2000-02-29", "2000-12-31"]).to_numpy()
        dy = decompose_time(times).decimal_year
        assert dy[0] == pytest.approx(2000.0 + 59 / 366)
        assert dy[1] == pytest.approx(2000.0 + 365 / 366)

    def test_dayofyear_leap_semantics(self):
        times = pd.to_datetime(["2000-03-01", "2001-03-01"]).to_numpy()
        info = decompose_time(times)
        assert info.dayofyear[0] == 61  # leap year
        assert info.dayofyear[1] == 60  # non-leap

    def test_dense_year_axis_with_gaps(self):
        times = pd.to_datetime(["2000-06-01", "2003-06-01"]).to_numpy()
        info = decompose_time(times)
        assert info.n_years == 4  # 2000..2003 dense
        assert info.year_index.tolist() == [0, 3]


class TestDigitize:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_matches_np_digitize(self, seed):
        rng = np.random.default_rng(seed)
        x = rng.normal(0, 1.5, 5000).astype(np.float32)
        x[::97] = np.nan
        edges = mquant.make_bin_edges(0.01, 5.0)
        nbins = len(edges) - 1
        got = np.asarray(mquant.digitize_anomalies(jnp.asarray(x), 0.01, nbins))
        expected = np.digitize(x, edges) - 1
        expected = np.where(np.isnan(x), nbins, expected)
        expected = np.clip(expected, 0, nbins)
        # float32 affine vs edge-array digitize: identical except at exact
        # bin boundaries (measure, not proof)
        mismatch = (got != expected).mean()
        assert mismatch < 0.001


class TestHistogramQuantile1D:
    @pytest.mark.parametrize("q", [0.9, 0.95, 0.99])
    def test_vs_exact_quantile(self, q):
        rng = np.random.default_rng(3)
        x = rng.normal(0, 1.0, (3000, 32)).astype(np.float32)
        edges = mquant.make_bin_edges(0.01, 5.0)
        nbins = len(edges) - 1
        centers = jnp.asarray(mquant.make_bin_centers(edges))
        bins = mquant.digitize_anomalies(jnp.asarray(x), 0.01, nbins)
        thr = np.asarray(mquant.global_thresholds_approx(bins, q, nbins, centers))
        exact = np.quantile(x, q, axis=0)
        np.testing.assert_allclose(thr, exact, atol=0.03)

    def test_nan_columns(self):
        x = np.full((100, 3), np.nan, np.float32)
        x[:, 0] = np.linspace(0, 2, 100)
        edges = mquant.make_bin_edges()
        nbins = len(edges) - 1
        centers = jnp.asarray(mquant.make_bin_centers(edges))
        bins = mquant.digitize_anomalies(jnp.asarray(x), 0.01, nbins)
        hist = mquant.histogram_bins_1d(bins, nbins)
        assert int(np.asarray(hist)[1].sum()) == 0  # all-NaN column counts nothing


class TestHistogramQuantile2D:
    def test_hobday_vs_exact(self):
        """Window histogram quantiles track exact windowed quantiles."""
        rng = np.random.default_rng(7)
        Y, S = 30, 16
        ymd = rng.normal(0.5, 1.0, (Y, 366, S)).astype(np.float32)

        q, window = 0.95, 11
        edges = mquant.make_bin_edges(0.01, 5.0)
        nbins = len(edges) - 1
        centers = jnp.asarray(mquant.make_bin_centers(edges))
        bins = mquant.digitize_anomalies(jnp.asarray(ymd), 0.01, nbins)
        thr = np.asarray(mquant.hobday_thresholds_approx(bins, q, window, nbins, centers))

        win = doy_window_indices(window)
        for d in [0, 100, 365]:
            samples = ymd[:, win[d], :].reshape(-1, S)
            exact = np.quantile(samples, q, axis=0)
            np.testing.assert_allclose(thr[d], exact, atol=0.05)

    def test_exact_hobday_matches_numpy(self):
        rng = np.random.default_rng(11)
        Y, S = 12, 8
        ymd = rng.normal(0, 1, (Y, 366, S)).astype(np.float32)
        ymd[2, 5, :] = np.nan  # missing day

        thr = np.asarray(mquant.hobday_thresholds_exact(jnp.asarray(ymd), 0.9, 11))
        win = doy_window_indices(11)
        for d in [3, 200]:
            samples = ymd[:, win[d], :].reshape(-1, S)
            expected = np.nanquantile(samples, 0.9, axis=0)
            np.testing.assert_allclose(thr[d], expected, rtol=1e-4, atol=1e-4)

    def test_tiled_equals_untiled(self):
        """Latitude-tiled hobday path is exact vs the single-tile path."""
        rng = np.random.default_rng(17)
        Y, ny, nx = 8, 12, 10
        ymd = rng.normal(0, 1, (Y, 366, ny * nx)).astype(np.float32)
        edges = mquant.make_bin_edges()
        nbins = len(edges) - 1
        centers = jnp.asarray(mquant.make_bin_centers(edges))
        bins = mquant.digitize_anomalies(jnp.asarray(ymd), 0.01, nbins)

        ref = np.asarray(
            mquant.hobday_thresholds_approx(bins, 0.9, 11, nbins, centers, window_spatial=3, grid_shape=(ny, nx))
        )
        old = mquant._HIST_TILE_BYTES
        mquant._HIST_TILE_BYTES = 366 * 3 * nx * nbins * 4  # force ~3-row tiles
        try:
            tiled = np.asarray(
                mquant.hobday_thresholds_approx(bins, 0.9, 11, nbins, centers, window_spatial=3, grid_shape=(ny, nx))
            )
        finally:
            mquant._HIST_TILE_BYTES = old
        np.testing.assert_allclose(tiled, ref, rtol=1e-6, atol=1e-6, equal_nan=True)

        # unstructured flat tiling
        ref_flat = np.asarray(mquant.hobday_thresholds_approx(bins, 0.9, 11, nbins, centers))
        mquant._HIST_TILE_BYTES = 366 * 17 * nbins * 4
        try:
            tiled_flat = np.asarray(mquant.hobday_thresholds_approx(bins, 0.9, 11, nbins, centers))
        finally:
            mquant._HIST_TILE_BYTES = old
        np.testing.assert_allclose(tiled_flat, ref_flat, rtol=1e-6, atol=1e-6, equal_nan=True)

    def test_2d_tiled_equals_untiled(self):
        """2-D spatial tiles (production widths where one halo'd row band
        exceeds the budget) are exact vs the single-tile path, for periodic
        and open longitude boundaries."""
        rng = np.random.default_rng(23)
        Y, ny, nx = 6, 9, 10
        ymd = rng.normal(0, 1, (Y, 366, ny * nx)).astype(np.float32)
        ymd[1, 100, :] = np.nan
        edges = mquant.make_bin_edges()
        nbins = len(edges) - 1
        centers = jnp.asarray(mquant.make_bin_centers(edges))
        bins = mquant.digitize_anomalies(jnp.asarray(ymd), 0.01, nbins)

        old = mquant._HIST_TILE_BYTES
        for wrap in (True, False):
            for ws in (3, None):
                ref = np.asarray(
                    mquant.hobday_thresholds_approx(
                        bins, 0.9, 11, nbins, centers, window_spatial=ws, grid_shape=(ny, nx), wrap_lon=wrap
                    )
                )
                mquant._HIST_TILE_BYTES = 366 * nbins * 4 * 4  # budget_cells=4 < nx -> 2-D path
                try:
                    tiled = np.asarray(
                        mquant.hobday_thresholds_approx(
                            bins, 0.9, 11, nbins, centers, window_spatial=ws, grid_shape=(ny, nx), wrap_lon=wrap
                        )
                    )
                finally:
                    mquant._HIST_TILE_BYTES = old
                np.testing.assert_allclose(tiled, ref, rtol=1e-6, atol=1e-6, equal_nan=True, err_msg=f"wrap={wrap} ws={ws}")

    def test_spatial_window_pooling(self):
        """5x5 spatial pooling smooths thresholds across neighbouring cells."""
        rng = np.random.default_rng(13)
        Y, ny, nx = 20, 8, 16
        ymd = rng.normal(0, 1, (Y, 366, ny * nx)).astype(np.float32)
        edges = mquant.make_bin_edges()
        nbins = len(edges) - 1
        centers = jnp.asarray(mquant.make_bin_centers(edges))
        bins = mquant.digitize_anomalies(jnp.asarray(ymd), 0.01, nbins)
        thr_pooled = np.asarray(
            mquant.hobday_thresholds_approx(bins, 0.95, 11, nbins, centers, window_spatial=5, grid_shape=(ny, nx))
        )
        thr_plain = np.asarray(mquant.hobday_thresholds_approx(bins, 0.95, 11, nbins, centers))
        # pooling reduces spatial variance of thresholds
        assert thr_pooled.std(axis=1).mean() < thr_plain.std(axis=1).mean()


class TestRollingMeans:
    def test_centered_rolling_mean_matches_pandas(self):
        rng = np.random.default_rng(2)
        x = rng.normal(size=(200, 4)).astype(np.float32)
        x[50, 1] = np.nan
        for w in (5, 21, 30):
            got = np.asarray(mclim.centered_rolling_mean_time(jnp.asarray(x), w))
            expected = pd.DataFrame(x).rolling(w, center=True).mean().to_numpy()
            np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5, equal_nan=True)

    def test_rolling_climatology_window_exclusive(self):
        """clim at year y uses ONLY years [y-W, y-1]."""
        Y, S = 10, 3
        ymd = np.zeros((Y, 366, S), np.float32)
        for y in range(Y):
            ymd[y] = y  # year index as value
        clim = np.asarray(mclim.rolling_climatology_ymd(jnp.asarray(ymd), 3))
        # year 5: mean of {2, 3, 4} = 3
        np.testing.assert_allclose(clim[5], 3.0)
        # years < window -> NaN
        assert np.isnan(clim[:3]).all()

    def test_dayofyear_std(self):
        rng = np.random.default_rng(5)
        ymd = rng.normal(0, 2.0, (50, 366, 4)).astype(np.float32)
        got = np.asarray(mclim.dayofyear_std(jnp.asarray(ymd)))
        expected = np.nanstd(ymd, axis=0)
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)


class TestExactHobdayTiling:
    def test_tiled_exact_equals_untiled(self):
        rng = np.random.default_rng(23)
        Y, S = 6, 40
        ymd = rng.normal(0, 1, (Y, 366, S)).astype(np.float32)
        ref = np.asarray(mquant.hobday_thresholds_exact(jnp.asarray(ymd), 0.9, 11))
        old = mquant._HIST_TILE_BYTES
        mquant._HIST_TILE_BYTES = Y * 6 * 11 * 7 * 4  # force ~7-point tiles
        try:
            tiled = np.asarray(mquant.hobday_thresholds_exact(jnp.asarray(ymd), 0.9, 11))
        finally:
            mquant._HIST_TILE_BYTES = old
        np.testing.assert_allclose(tiled, ref, rtol=1e-5, atol=1e-5, equal_nan=True)


class TestGlobalThresholdsBinarySearch:
    """global_thresholds_approx computes the quantile by binary-search count
    passes; it must equal the materialised-histogram CDF path bit-for-bit."""

    def test_matches_histogram_cdf_path(self):
        rng = np.random.default_rng(7)
        edges = mquant.make_bin_edges(0.01, 5.0)
        centers = jnp.asarray(mquant.make_bin_centers(edges))
        nbins = len(edges) - 1
        x = rng.standard_normal((400, 96)).astype(np.float32) * 1.5
        x[:, :4] = np.nan          # all-NaN columns
        x[:100, 4:8] = np.nan      # partial NaN
        x[:, 8] = 0.0              # constant column
        x[:, 9] = 7.0              # all overflow -> sentinel bin
        bins = mquant.digitize_anomalies(jnp.asarray(x), 0.01, nbins)
        for q in (0.5, 0.9, 0.95, 0.99):
            old = np.asarray(mquant.histogram_quantile_cdf(mquant.histogram_bins_1d(bins, nbins), q, centers))
            new = np.asarray(mquant.global_thresholds_approx(bins, q, nbins, centers))
            # same bin selections and interpolation up to FMA-fusion ULPs
            assert np.isnan(old).tolist() == np.isnan(new).tolist()
            np.testing.assert_allclose(new[~np.isnan(new)], old[~np.isnan(old)], rtol=0, atol=1e-6)


class TestPreprocessingStepsProvenance:
    """The preprocessing_steps provenance strings cover every method
    combination (reference tests/test_detect_helpers.py
    TestGetPreprocessingSteps)."""

    def _steps(self, **kw):
        from marex_tpu.detect import _get_preprocessing_steps

        base = dict(
            method_anomaly="detrend_harmonic",
            method_extreme="global_extreme",
            std_normalise=False,
            detrend_orders=[1],
            window_year_baseline=15,
            smooth_days_baseline=21,
            window_days_hobday=11,
            window_spatial_hobday=None,
            reference_period=None,
        )
        base.update(kw)
        return _get_preprocessing_steps(**base)

    def test_detrend_harmonic_steps(self):
        steps = self._steps(detrend_orders=[1, 2])
        assert any("polynomial trend orders=[1, 2]" in s for s in steps)
        assert any("seasonal cycle" in s for s in steps)

    def test_detrend_harmonic_with_std_normalise(self):
        steps = self._steps(std_normalise=True)
        assert any("rolling STD" in s for s in steps)

    def test_shifting_baseline_steps(self):
        steps = self._steps(method_anomaly="shifting_baseline", window_year_baseline=10, smooth_days_baseline=31)
        assert any("10 years" in s for s in steps)
        assert any("31-day window" in s for s in steps)

    def test_fixed_baseline_reference_period(self):
        steps = self._steps(method_anomaly="fixed_baseline", reference_period=(1991, 2020))
        assert any("1991-2020" in s for s in steps)
        steps_full = self._steps(method_anomaly="fixed_baseline")
        assert any("full time series" in s for s in steps_full)

    def test_detrend_fixed_baseline_steps(self):
        steps = self._steps(method_anomaly="detrend_fixed_baseline", detrend_orders=[1])
        assert any("polynomial trend" in s for s in steps)
        assert any("detrended data" in s for s in steps)

    def test_hobday_extreme_steps(self):
        steps = self._steps(method_extreme="hobday_extreme", window_days_hobday=11)
        assert any("11 day window" in s for s in steps)
        steps_sp = self._steps(method_extreme="hobday_extreme", window_spatial_hobday=5)
        assert any("5 spatial neighbours" in s for s in steps_sp)

    def test_all_combinations_nonempty_and_distinct(self):
        anomalies = ["detrend_harmonic", "shifting_baseline", "fixed_baseline", "detrend_fixed_baseline"]
        extremes = ["global_extreme", "hobday_extreme"]
        seen = set()
        for a in anomalies:
            for e in extremes:
                steps = tuple(self._steps(method_anomaly=a, method_extreme=e))
                assert len(steps) >= 2, (a, e)
                assert steps not in seen, "step descriptions must be distinct per method pair"
                seen.add(steps)


class TestHistogramQuantileEdgeCases:
    """Histogram quantile behaviours beyond the happy path (reference
    TestComputeHistogramQuantile1D/2D edge cases)."""

    def test_multiple_quantiles_monotone(self):
        import jax.numpy as jnp

        from marex_tpu.ops import quantile as Q

        rng = np.random.default_rng(3)
        data = rng.normal(0, 1, size=(4000, 7)).astype(np.float32)
        edges = np.linspace(-6, 6, 241).astype(np.float32)
        centers = (edges[:-1] + edges[1:]) / 2
        idx = np.clip(np.digitize(data, edges) - 1, 0, 239)
        hist = np.zeros((7, 240), np.int32)
        for c in range(7):
            np.add.at(hist[c], idx[:, c], 1)
        prev = -np.inf
        for q in (0.5, 0.8, 0.9, 0.95, 0.99):
            thr = np.asarray(Q.histogram_quantile_cdf(jnp.asarray(hist), q, jnp.asarray(centers)))
            exact = np.quantile(data, q, axis=0)
            np.testing.assert_allclose(thr, exact, atol=0.06)
            assert (thr >= prev - 1e-6).all(), "quantiles must be monotone in q"
            prev = thr

    def test_custom_coarse_bins_still_close(self):
        import jax.numpy as jnp

        from marex_tpu.ops import quantile as Q

        rng = np.random.default_rng(4)
        data = rng.normal(0, 1, size=(8000,)).astype(np.float32)
        edges = np.linspace(-5, 5, 41).astype(np.float32)  # coarse 0.25-wide bins
        centers = (edges[:-1] + edges[1:]) / 2
        hist = np.histogram(data, bins=edges)[0].astype(np.int32)
        thr = float(Q.histogram_quantile_cdf(jnp.asarray(hist), 0.95, jnp.asarray(centers)))
        assert abs(thr - np.quantile(data, 0.95)) < 0.25

    def test_counts_path_empty_histogram_nan(self):
        import jax.numpy as jnp

        from marex_tpu.ops import quantile as Q

        centers = jnp.linspace(-1, 1, 16)
        hist = jnp.zeros((3, 16), jnp.int32)
        thr = np.asarray(Q.histogram_quantile_counts(hist, 0.9, centers))
        assert np.isnan(thr).all()

    def test_counts_path_single_bin_mass(self):
        import jax.numpy as jnp

        from marex_tpu.ops import quantile as Q

        centers = jnp.linspace(0, 15, 16)
        hist = jnp.zeros((16,), jnp.int32).at[7].set(100)
        thr = float(Q.histogram_quantile_counts(hist, 0.9, centers))
        assert abs(thr - 7.0) <= 0.5

    def test_hobday_window_sizes_change_thresholds(self):
        import jax.numpy as jnp

        from marex_tpu.ops import quantile as Q

        rng = np.random.default_rng(5)
        # 3 years daily, 6 cells, with a seasonal cycle so the DOY window matters
        Y, D, S = 3, 366, 6
        doyv = np.arange(D)
        base = 2.0 * np.sin(2 * np.pi * doyv / 365.0)[None, :, None]
        data = (base + rng.normal(0, 1, size=(Y, D, S))).astype(np.float32)
        t5 = np.asarray(Q.hobday_thresholds_exact(jnp.asarray(data), 0.9, 5))
        t31 = np.asarray(Q.hobday_thresholds_exact(jnp.asarray(data), 0.9, 31))
        assert t5.shape == t31.shape == (D, S)
        # wider windows pool more of the seasonal cycle -> thresholds differ
        assert np.nanmax(np.abs(t5 - t31)) > 0.05


class TestAddDecimalYearAPI:
    """Public ``add_decimal_year`` accessor (cf. reference
    tests/test_detect_helpers.py::TestAddDecimalYear): attaches a
    ``decimal_year`` coordinate along the time dim."""

    def _da(self, dates, dim="time"):
        from marex_tpu.core.field import Field

        return Field(
            np.random.default_rng(0).standard_normal(len(dates)).astype(np.float32),
            (dim,),
            {dim: np.asarray(dates)},
            name="v",
        )

    def test_basic_and_leap(self):
        import marex_tpu as marEx

        dates = pd.date_range("2020-01-01", "2020-12-31", freq="D").to_numpy()
        out = marEx.add_decimal_year(self._da(dates))
        dy = np.asarray(out.coords["decimal_year"].values)
        assert dy.shape == (len(dates),)
        assert dy[0] == pytest.approx(2020.0, abs=1e-6)
        # 2020 is a leap year: Dec 31 sits 365/366 through the year
        assert dy[-1] == pytest.approx(2020.0 + 365 / 366, abs=1e-6)
        june1 = dy[np.asarray(pd.DatetimeIndex(dates).month == 6)
                   & np.asarray(pd.DatetimeIndex(dates).day == 1)][0]
        assert 2020.4 < june1 < 2020.5

    def test_non_leap_year(self):
        import marex_tpu as marEx

        dates = pd.date_range("2021-01-01", "2021-12-31", freq="D").to_numpy()
        dy = np.asarray(marEx.add_decimal_year(self._da(dates)).coords["decimal_year"].values)
        assert dy[-1] == pytest.approx(2021.0 + 364 / 365, abs=1e-6)

    def test_custom_dim(self):
        import marex_tpu as marEx

        dates = pd.date_range("2020-01-01", periods=10, freq="D").to_numpy()
        out = marEx.add_decimal_year(self._da(dates, dim="custom_time"), "custom_time")
        dy = np.asarray(out.coords["decimal_year"].values)
        assert dy.shape == (10,)
        assert np.all(dy >= 2020.0) and np.all(dy < 2020.1)

    def test_single_date(self):
        import marex_tpu as marEx

        dates = pd.to_datetime(["2020-07-01"]).to_numpy()
        dy = np.asarray(marEx.add_decimal_year(self._da(dates)).coords["decimal_year"].values)
        assert dy.shape == (1,)
        assert 2020.45 < dy[0] < 2020.55
