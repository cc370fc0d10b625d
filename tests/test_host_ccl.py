"""Host CCL fast path (csrc/marex_host.cpp marex_track_nomerge) parity.

The gridded no-merge tracking pipeline can run its whole post-morphology
stage on the host (run-based per-slice CCL -> area filter -> 3x3x3 event
labeling); these tests pin it BIT-EXACT against the device kernels — ID
field, event count, object counts and threshold — across threshold modes
and boundary modes. Reference semantics: marEx/track.py:1755-1906 (area
filter incl. the drop-first-object quirk) and 1947-2034 / 2011-2013
(labeling substrate).
"""

import numpy as np
import pandas as pd
import pytest

import marex_tpu as marEx
from marex_tpu import Field, _native


def _blob_field(seed, T=120, H=64, W=96):
    rng = np.random.default_rng(seed)
    data = np.zeros((T, H, W), bool)
    yy, xx = np.mgrid[0:H, 0:W]
    for _ in range(40):
        t0 = rng.integers(0, T - 5)
        dur = int(rng.integers(2, 5))
        cy, cx = rng.integers(6, H - 6), rng.integers(0, W)
        r = int(rng.integers(2, 7))
        dx = np.minimum(np.abs(xx - cx), W - np.abs(xx - cx))
        data[t0 : t0 + dur] |= (yy - cy) ** 2 + dx ** 2 <= r * r
    # seam-crossing blobs exercise the periodic union logic
    data[10:16, 20:30, 0:4] = True
    data[10:16, 20:30, W - 4 :] = True
    times = pd.date_range("2000-01-01", periods=T, freq="D").to_numpy()
    coords = {"time": times, "lat": np.linspace(-60, 60, H), "lon": np.linspace(0, 360, W, endpoint=False)}
    ev = Field(data, ("time", "lat", "lon"), coords, name="extreme_events")
    mask = Field(np.ones((H, W), bool), ("lat", "lon"), {"lat": coords["lat"], "lon": coords["lon"]}, name="mask")
    return ev, mask


requires_native = pytest.mark.skipif(not _native.has_native(), reason="native library unavailable")


def _run(ev, mask, host: bool, monkeypatch, **kw):
    monkeypatch.setenv("MAREX_HOST_CCL", "1" if host else "0")
    tr = marEx.tracker(ev, mask, allow_merging=False, quiet=True, **kw)
    events = tr.run()
    return np.asarray(events["ID_field"].data), dict(events.attrs)


STAT_KEYS = ("N_events_final", "N_objects_prefiltered", "N_objects_filtered", "area_threshold (cells)")


@requires_native
@pytest.mark.parametrize("thr_kw", [{"area_filter_quartile": 0.5}, {"area_filter_absolute": 40}])
def test_host_path_matches_device(thr_kw, monkeypatch):
    ev, mask = _blob_field(0)
    id_dev, at_dev = _run(ev, mask, False, monkeypatch, R_fill=2, T_fill=2, **thr_kw)
    id_host, at_host = _run(ev, mask, True, monkeypatch, R_fill=2, T_fill=2, **thr_kw)
    assert (id_dev == id_host).all()
    for k in STAT_KEYS:
        assert at_dev[k] == at_host[k], k


@requires_native
def test_host_path_regional_mode(monkeypatch):
    ev, mask = _blob_field(1)
    kw = dict(R_fill=2, T_fill=2, area_filter_absolute=30, coordinate_units="degrees")
    monkeypatch.setenv("MAREX_HOST_CCL", "0")
    tr = marEx.regional_tracker(ev, mask, allow_merging=False, quiet=True, **kw)
    id_dev = np.asarray(tr.run()["ID_field"].data)
    monkeypatch.setenv("MAREX_HOST_CCL", "1")
    tr = marEx.regional_tracker(ev, mask, allow_merging=False, quiet=True, **kw)
    id_host = np.asarray(tr.run()["ID_field"].data)
    assert (id_dev == id_host).all()


@requires_native
def test_merge_mode_never_uses_host_path(monkeypatch):
    """The scan march needs device-resident per-slice labels, so merging
    trackers must ignore MAREX_HOST_CCL=1."""
    ev, mask = _blob_field(2)
    monkeypatch.setenv("MAREX_HOST_CCL", "1")
    tr = marEx.tracker(
        ev, mask, R_fill=2, T_fill=2, area_filter_quartile=0.25,
        allow_merging=True, overlap_threshold=0.25, quiet=True,
    )
    events = tr.run()
    assert getattr(tr, "_host_label_state", None) is None
    assert events.attrs["N_events_final"] > 0


@requires_native
def test_track_nomerge_kernel_against_device_labeling():
    """Raw kernel parity on a field with many events: per-slice counts and
    the 3-D labeling order must equal the device kernels exactly."""
    import jax.numpy as jnp

    from marex_tpu.ops import label as L

    rng = np.random.default_rng(3)
    T, H, W = 10, 48, 80
    d = np.zeros((T, H, W), bool)
    yy, xx = np.mgrid[0:H, 0:W]
    for _ in range(30):
        t0 = rng.integers(0, T)
        cy, cx = rng.integers(3, H - 3), rng.integers(0, W)
        r = int(rng.integers(1, 6))
        dx = np.minimum(np.abs(xx - cx), W - np.abs(xx - cx))
        d[t0 : min(t0 + int(rng.integers(1, 4)), T)] |= (yy - cy) ** 2 + dx ** 2 <= r * r
    for wrap in (True, False):
        bits = np.packbits(d, axis=-1, bitorder="little")
        id_field, bool_field, n_events, counts, areas, thr, n_kept = _native.track_nomerge(
            bits, T, H, W, wrap, 0.0, None, drop_first=False
        )
        assert (bool_field == (id_field > 0)).all()
        # threshold 0 + no drop-first keeps everything -> plain 3-D labeling
        ref3, nref = L.label_spacetime_grid(jnp.asarray(d), wrap_x=wrap)
        assert n_events == int(nref)
        assert (id_field == np.asarray(ref3)).all()
        _, dc = L.label_slices_grid(jnp.asarray(d), wrap_x=wrap)
        assert (counts == np.asarray(dc)).all()


@requires_native
def test_unstructured_host_ccl_matches_device(monkeypatch):
    """Host union-find per-slice CCL over the neighbour graph must equal the
    device fixpoint kernel exactly (labels, counts) — dense ids in ascending
    min-cell-index order (reference: csgraph per slice, track.py:1947-1999)."""
    import jax.numpy as jnp

    from marex_tpu import track as TR
    from marex_tpu.ops import label as L

    rng = np.random.default_rng(1)
    C, T = 5000, 24
    # ring + skip graph, symmetrized
    nb = np.stack([(np.arange(C) - 1) % C, (np.arange(C) + 1) % C, (np.arange(C) + 7) % C]).astype(np.int32)
    sym = TR._symmetrize_neighbours(nb)
    d = rng.random((T, C)) < 0.2
    bits = np.packbits(d, axis=-1, bitorder="little")
    res = _native.unstr_slice_ccl(bits, T, C, sym)
    assert res is not None
    lab16, counts = res
    ref_lab, ref_counts = L.label_slices_unstructured(jnp.asarray(d), jnp.asarray(sym))
    assert (counts == np.asarray(ref_counts)).all()
    assert (lab16.astype(np.int32) == np.asarray(ref_lab)).all()
