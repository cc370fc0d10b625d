"""Kernel-level unit tests for tracker ops against scipy/numpy references.

Mirrors the reference's pure-kernel test strategy
(tests/test_track_helpers.py): morphology vs scipy.ndimage, CCL vs
scipy.ndimage.label, distance transforms vs scipy, overlap pair extraction vs
brute-force numpy.
"""

import numpy as np
import pytest
from scipy import ndimage

import jax.numpy as jnp

from marex_tpu.ops import label as mlabel
from marex_tpu.ops import morphology as mmorph
from marex_tpu.ops import overlap as moverlap
from marex_tpu.ops import partition as mpart
from marex_tpu.ops import properties as mprops


def random_blobs(T=4, H=32, W=48, p=0.12, seed=0):
    rng = np.random.default_rng(seed)
    raw = rng.random((T, H, W)) < p
    # dilate once to make blobby structures
    return ndimage.binary_dilation(raw, structure=np.ones((1, 3, 3), bool))


class TestMorphology:
    def test_closing_opening_matches_scipy(self):
        data = random_blobs()
        mask = np.ones(data.shape[1:], bool)
        r = 3
        se = mmorph.disk_kernel(r)
        got = np.asarray(mmorph.binary_close_open_grid(jnp.asarray(data), r, jnp.asarray(mask), mode="wrap"))

        d = 4 * r  # marex_tpu pads 4R for exact periodic invariance
        padded = np.pad(data, ((0, 0), (d, d), (d, d)), mode="wrap")
        closed = ndimage.binary_closing(padded, structure=se[None])
        opened = ndimage.binary_opening(closed, structure=se[None])
        expected = opened[:, d:-d, d:-d]
        np.testing.assert_array_equal(got, expected)

    def test_r0_is_identity_with_mask(self):
        data = random_blobs(T=2)
        mask = np.ones(data.shape[1:], bool)
        mask[:5] = False
        got = np.asarray(mmorph.binary_close_open_grid(jnp.asarray(data), 0, jnp.asarray(mask)))
        np.testing.assert_array_equal(got, data & mask[None])

    def test_temporal_closing_fills_gaps(self):
        T = 30
        data = np.zeros((T, 4, 4), bool)
        data[5:10, 1, 1] = True
        data[12:20, 1, 1] = True  # gap of 2 steps (10, 11)
        got = np.asarray(mmorph.binary_close_time(jnp.asarray(data), 2))
        assert got[10, 1, 1] and got[11, 1, 1]
        # no spurious extension at the ends
        assert not got[4, 1, 1] and not got[20, 1, 1]

    def test_temporal_closing_matches_scipy(self):
        rng = np.random.default_rng(3)
        data = rng.random((40, 5, 5)) < 0.3
        t_fill = 4
        k = np.ones((t_fill + 1, 1, 1), bool)
        padded = np.pad(data, ((t_fill + 1, t_fill + 1), (0, 0), (0, 0)), constant_values=False)
        expected = ndimage.binary_closing(padded, structure=k)[t_fill + 1 : -(t_fill + 1)]
        got = np.asarray(mmorph.binary_close_time(jnp.asarray(data), t_fill))
        np.testing.assert_array_equal(got, expected)

    def test_neighbour_dilate_matches_matrix_power(self):
        # small mesh: chain 0-1-2-3-4 plus isolated 5
        C = 6
        nb = -np.ones((3, C), np.int32)
        for i in range(4):
            nb[0, i] = i + 1
            nb[1, i + 1] = i
        vec = np.zeros((2, C), bool)
        vec[0, 0] = True
        vec[1, 5] = True
        got1 = np.asarray(mmorph.neighbour_dilate(jnp.asarray(vec), jnp.asarray(nb), 1))
        assert got1[0].tolist() == [True, True, False, False, False, False]
        assert got1[1].tolist() == [False, False, False, False, False, True]
        got3 = np.asarray(mmorph.neighbour_dilate(jnp.asarray(vec), jnp.asarray(nb), 3))
        assert got3[0].tolist() == [True, True, True, True, False, False]


class TestLabeling:
    def test_2d_labels_match_scipy_counts(self):
        data = random_blobs(T=6, seed=5)
        got, counts = mlabel.label_slices_grid(jnp.asarray(data), wrap_x=False)
        got, counts = np.asarray(got), np.asarray(counts)
        s = np.ones((3, 3), int)
        for t in range(data.shape[0]):
            expected, n = ndimage.label(data[t], structure=s)
            assert counts[t] == n
            # same partition: label maps must be related by a bijection
            assert (got[t] > 0).sum() == (expected > 0).sum()
            pairs = set(zip(got[t][data[t]].ravel(), expected[data[t]].ravel()))
            assert len(pairs) == n  # one-to-one

    def test_wrap_connectivity(self):
        data = np.zeros((1, 4, 10), bool)
        data[0, 1, 0] = True
        data[0, 1, 9] = True
        _, counts_wrap = mlabel.label_slices_grid(jnp.asarray(data), wrap_x=True)
        _, counts_nowrap = mlabel.label_slices_grid(jnp.asarray(data), wrap_x=False)
        assert int(counts_wrap[0]) == 1
        assert int(counts_nowrap[0]) == 2

    def test_3d_spacetime_labels(self):
        data = np.zeros((5, 6, 6), bool)
        data[0:3, 1, 1] = True  # event A: persists t=0..2
        data[4, 4, 4] = True  # event B: single step later, disjoint
        labels, n = mlabel.label_spacetime_grid(jnp.asarray(data), wrap_x=False)
        assert int(n) == 2
        labels = np.asarray(labels)
        assert labels[0, 1, 1] == labels[2, 1, 1]
        assert labels[4, 4, 4] != labels[0, 1, 1]

    def test_3d_matches_scipy(self):
        data = random_blobs(T=5, H=20, W=24, seed=9)
        labels, n = mlabel.label_spacetime_grid(jnp.asarray(data), wrap_x=False)
        expected, n_ref = ndimage.label(data, structure=np.ones((3, 3, 3), int))
        assert int(n) == n_ref
        pairs = set(zip(np.asarray(labels)[data].ravel(), expected[data].ravel()))
        assert len(pairs) == n_ref

    def test_unstructured_labels(self):
        # chain 0-1-2, pair 4-5, isolated 3
        C = 6
        nb = -np.ones((3, C), np.int32)
        nb[0, 0], nb[1, 1] = 1, 0
        nb[0, 1], nb[1, 2] = 2, 1
        nb[0, 4], nb[1, 5] = 5, 4
        data = np.array([[True, True, True, True, True, True], [True, False, True, False, False, True]])
        labels, counts = mlabel.label_slices_unstructured(jnp.asarray(data), jnp.asarray(nb))
        labels, counts = np.asarray(labels), np.asarray(counts)
        assert counts[0] == 3  # {0,1,2}, {3}, {4,5}
        assert labels[0, 0] == labels[0, 1] == labels[0, 2]
        assert labels[0, 4] == labels[0, 5] != labels[0, 3]
        assert counts[1] == 3  # singletons {0}, {2}, {5}
        assert labels[1, 1] == 0

    def test_offset_labels(self):
        labels = np.array([[0, 1, 2], [1, 0, 1], [0, 0, 3]], np.int32)
        counts = np.array([2, 1, 3], np.int32)
        got = np.asarray(mlabel.offset_labels_across_time(jnp.asarray(labels), jnp.asarray(counts)))
        np.testing.assert_array_equal(got, [[0, 1, 2], [3, 0, 3], [0, 0, 6]])


class TestProperties:
    def test_grid_props_match_direct(self):
        data = random_blobs(T=3, seed=11)
        labels, counts = mlabel.label_slices_grid(jnp.asarray(data), wrap_x=False)
        L = int(np.asarray(counts).max())
        areas, cy, cx = mprops.grid_label_props(labels, L, wrap=False)
        areas, cy, cx = map(np.asarray, (areas, cy, cx))
        labels = np.asarray(labels)
        for t in range(data.shape[0]):
            for lab in range(1, int(np.asarray(counts)[t]) + 1):
                m = labels[t] == lab
                assert areas[t, lab] == m.sum()
                yy, xx = np.nonzero(m)
                np.testing.assert_allclose(cy[t, lab], yy.mean(), rtol=1e-5)
                np.testing.assert_allclose(cx[t, lab], xx.mean(), rtol=1e-5)

    def test_wrap_centroid_fix(self):
        # object straddling the x boundary of a wide grid
        H, W = 4, 300
        labels = np.zeros((1, H, W), np.int32)
        labels[0, 1, :10] = 1
        labels[0, 1, -10:] = 1
        _, _, cx = mprops.grid_label_props(jnp.asarray(labels), 1, wrap=True)
        cx = float(np.asarray(cx)[0, 1])
        # true wrapped centroid is at x = -0.5 mod 300 = 299.5
        assert abs(cx - 299.5) < 1e-3

    def test_spherical_centroid(self):
        labels = np.array([[1, 1, 2]], np.int32)
        lat = np.array([10.0, 20.0, -45.0], np.float32)
        lon = np.array([0.0, 0.0, 90.0], np.float32)
        area = np.array([1.0, 1.0, 2.0], np.float32)
        areas, clat, clon = mprops.unstructured_label_props(
            jnp.asarray(labels), jnp.asarray(lat), jnp.asarray(lon), jnp.asarray(area), 2
        )
        areas, clat, clon = map(np.asarray, (areas, clat, clon))
        assert areas[0, 1] == 2.0 and areas[0, 2] == 2.0
        assert abs(clat[0, 1] - 15.0) < 0.2  # midpoint on same meridian
        assert abs(clat[0, 2] + 45.0) < 1e-4 and abs(clon[0, 2] - 90.0) < 1e-4


class TestOverlap:
    def test_pairs_match_bruteforce(self):
        rng = np.random.default_rng(4)
        a = rng.integers(0, 6, 500).astype(np.int32)
        b = rng.integers(0, 7, 500).astype(np.int32)
        w = np.ones(500, np.float32)
        pa, pb, pw = moverlap.overlap_pairs_slice(jnp.asarray(a), jnp.asarray(b), jnp.asarray(w), 64, 1024)
        pa, pb, pw = map(np.asarray, (pa, pb, pw))
        got = {(int(x), int(y)): float(z) for x, y, z in zip(pa, pb, pw) if x >= 0}
        expected = {}
        for x, y in zip(a, b):
            if x > 0 and y > 0:
                expected[(x, y)] = expected.get((x, y), 0) + 1
        assert got == expected

    def test_weighted_pairs(self):
        a = np.array([1, 1, 2, 0], np.int32)
        b = np.array([3, 3, 3, 3], np.int32)
        w = np.array([0.5, 1.5, 2.0, 9.0], np.float32)
        pa, pb, pw = moverlap.overlap_pairs_slice(jnp.asarray(a), jnp.asarray(b), jnp.asarray(w), 8, 100)
        got = {(int(x), int(y)): float(z) for x, y, z in zip(np.asarray(pa), np.asarray(pb), np.asarray(pw)) if x >= 0}
        assert got == {(1, 3): 2.0, (2, 3): 2.0}

    def test_union_find(self):
        nodes = np.array([1, 2, 3, 4, 5, 10])
        pairs = np.array([[1, 2], [2, 3], [4, 5]])
        comp = moverlap.union_find_components(pairs, nodes)
        assert comp[0] == comp[1] == comp[2]
        assert comp[3] == comp[4] != comp[0]
        assert comp[5] not in (comp[0], comp[3])


class TestPartition:
    def test_edt_matches_scipy(self):
        rng = np.random.default_rng(8)
        masks = rng.random((3, 20, 30)) < 0.05
        masks[1] = False  # empty parent
        d2 = np.asarray(mpart.euclidean_distance_transform_grid(jnp.asarray(masks), wrap=False))
        for p in range(3):
            if not masks[p].any():
                assert np.isinf(d2[p]).all()
                continue
            expected = ndimage.distance_transform_edt(~masks[p]) ** 2
            np.testing.assert_allclose(d2[p], expected, rtol=1e-4, atol=1e-3)

    def test_edt_wrap(self):
        mask = np.zeros((1, 3, 20), bool)
        mask[0, 1, 0] = True
        d2 = np.asarray(mpart.euclidean_distance_transform_grid(jnp.asarray(mask), wrap=True))
        # cell at x=19 is distance 1 through the periodic boundary
        assert d2[0, 1, 19] == 1.0

    def test_edt_row_window_exact_within_cap(self):
        # windowed column pass must be exact for every distance <= window
        rng = np.random.default_rng(11)
        masks = rng.random((4, 40, 30)) < 0.02
        full = np.asarray(mpart.euclidean_distance_transform_grid(jnp.asarray(masks), wrap=True))
        win = 8
        windowed = np.asarray(
            mpart.euclidean_distance_transform_grid(jnp.asarray(masks), wrap=True, row_window=win)
        )
        inside = full <= win * win
        np.testing.assert_array_equal(windowed[inside], full[inside])
        # beyond the window distances may only be overestimated
        assert (windowed >= full - 1e-6).all()

    def test_partition_nn_grid_prefers_nearest_cell(self):
        H, W = 10, 20
        parents = np.zeros((2, H, W), bool)
        parents[0, 5, 2] = True  # parent 0 on the left
        parents[1, 5, 17] = True  # parent 1 on the right
        valid = np.array([True, True])
        cents = np.array([[5.0, 2.0], [5.0, 17.0]], np.float32)
        assign = np.asarray(
            mpart.partition_nn_grid(
                jnp.zeros((H, W), bool), jnp.asarray(parents), jnp.asarray(valid), jnp.asarray(cents), 50.0, wrap=False
            )
        )
        assert assign[5, 4] == 0
        assert assign[5, 15] == 1

    def test_partition_centroid_fallback_beyond_cap(self):
        H, W = 6, 40
        parents = np.zeros((2, H, W), bool)
        parents[0, 3, 0] = True
        parents[1, 3, 39] = True
        valid = np.array([True, True])
        # centroids deliberately swapped relative to the masks
        cents = np.array([[3.0, 39.0], [3.0, 0.0]], np.float32)
        assign = np.asarray(
            mpart.partition_nn_grid(
                jnp.zeros((H, W), bool), jnp.asarray(parents), jnp.asarray(valid), jnp.asarray(cents), 2.0, wrap=False
            )
        )
        # near parent 0's mask: within cap -> nearest cell wins
        assert assign[3, 1] == 0
        # mid-grid: beyond cap -> centroid fallback; x=25 is closer to centroid[0]=(3,39)? no, to cents[1]=(3,0) dist 25 vs (3,39) dist 14
        assert assign[3, 25] == 0

    def test_hop_distance_and_partition_unstructured(self):
        # chain 0-1-2-3-4-5
        C = 6
        nb = -np.ones((3, C), np.int32)
        for i in range(C - 1):
            nb[0, i] = i + 1
            nb[1, i + 1] = i
        seeds = np.zeros((2, C), bool)
        seeds[0, 0] = True
        seeds[1, 5] = True
        dist = np.asarray(mpart.hop_distance_unstructured(jnp.asarray(seeds), jnp.asarray(nb), 10))
        np.testing.assert_array_equal(dist[0], [0, 1, 2, 3, 4, 5])
        np.testing.assert_array_equal(dist[1], [5, 4, 3, 2, 1, 0])

        child = np.ones(C, bool)
        lat = np.zeros(C, np.float32)
        lon = np.arange(C, dtype=np.float32)
        cents = np.array([[0.0, 0.0], [0.0, 5.0]], np.float32)
        assign = np.asarray(
            mpart.partition_nn_unstructured(
                jnp.asarray(child),
                jnp.asarray(seeds),
                jnp.asarray(np.array([True, True])),
                jnp.asarray(cents),
                jnp.asarray(nb),
                jnp.asarray(lat),
                jnp.asarray(lon),
                10,
            )
        )
        np.testing.assert_array_equal(assign, [0, 0, 0, 1, 1, 1])

    def test_partition_centroid_unstructured(self):
        lat = np.array([0.0, 0.0, 0.0], np.float32)
        lon = np.array([0.0, 10.0, 20.0], np.float32)
        cents = np.array([[0.0, 0.0], [0.0, 20.0]], np.float32)
        assign = np.asarray(
            mpart.partition_centroid_unstructured(
                jnp.asarray(cents), jnp.asarray(np.array([True, True])), jnp.asarray(lat), jnp.asarray(lon)
            )
        )
        np.testing.assert_array_equal(assign, [0, 0, 1])
