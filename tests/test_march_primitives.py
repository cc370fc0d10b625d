"""Oracle tests for the scan march's MP-sized slot primitives.

These pin the slot-array algebra the march is built from
(``_sort_aggregate_global``, ``_rename_slots``, ``_threshold_keep``,
``_map_pairs_to_global``) against tiny numpy oracles — reference
semantics: ``/root/reference/marEx/track.py`` overlap-list handling
(``check_overlap_slice`` aggregation, ``_enforce_overlap_threshold``,
consolidation renames). Cheap pure-slot tests (no field-sized inputs)
that make the primitives safe to re-optimise independently of the full
march equality suite in tests/test_scan_march.py.
"""

import numpy as np
import jax.numpy as jnp

from marex_tpu.ops import march as M


def slots(vals, MP, fill):
    out = np.full((MP,), fill, np.asarray(vals).dtype if len(vals) else np.int32)
    out[: len(vals)] = vals
    return out


class TestSortAggregateGlobal:
    def test_sorts_by_pair_and_sums_duplicates(self):
        MP = 8
        ga = jnp.asarray(slots(np.array([5, 2, 5, 2], np.int32), MP, -1))
        gb = jnp.asarray(slots(np.array([7, 3, 7, 9], np.int32), MP, -1))
        w = jnp.asarray(slots(np.array([1.0, 2.0, 4.0, 8.0], np.float32), MP, np.float32(0)))
        oa, ob, ow = (np.asarray(x) for x in M._sort_aggregate_global(ga, gb, w, MP))
        # ascending (a, b); (5,7) appears twice -> one slot with summed weight
        assert list(oa[:3]) == [2, 2, 5]
        assert list(ob[:3]) == [3, 9, 7]
        np.testing.assert_array_equal(ow[:3], [2.0, 8.0, 5.0])
        assert (oa[3:] == -1).all() and (ow[3:] == 0).all()

    def test_invalid_slots_sort_last_and_are_dropped(self):
        MP = 4
        ga = jnp.asarray(np.array([-1, 3, -1, 1], np.int32))
        gb = jnp.asarray(np.array([9, 2, 9, 5], np.int32))
        w = jnp.asarray(np.array([99.0, 1.0, 99.0, 2.0], np.float32))
        oa, ob, ow = (np.asarray(x) for x in M._sort_aggregate_global(ga, gb, w, MP))
        assert list(oa[:2]) == [1, 3] and list(ob[:2]) == [5, 2]
        np.testing.assert_array_equal(ow[:2], [2.0, 1.0])
        assert (oa[2:] == -1).all() and (ow[2:] == 0.0).all()

    def test_idempotent_on_sorted_unique_input(self):
        MP = 6
        ga = jnp.asarray(slots(np.array([1, 2, 4], np.int32), MP, -1))
        gb = jnp.asarray(slots(np.array([5, 1, 2], np.int32), MP, -1))
        w = jnp.asarray(slots(np.array([1.5, 2.5, 3.5], np.float32), MP, np.float32(0)))
        out1 = M._sort_aggregate_global(ga, gb, w, MP)
        out2 = M._sort_aggregate_global(*out1, MP)
        for a, b in zip(out1, out2):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestRenameSlots:
    def test_renames_every_occurrence(self):
        vals = jnp.asarray(np.array([3, 7, 3, 9, -1], np.int32))
        olds = jnp.asarray(np.array([3, 9, -1], np.int32))
        news = jnp.asarray(np.array([11, 12, 0], np.int32))
        out = np.asarray(M._rename_slots(vals, olds, news))
        np.testing.assert_array_equal(out, [11, 7, 11, 12, -1])

    def test_invalid_old_entries_do_not_match(self):
        # olds=-1 padding must never capture vals==-1 slots
        vals = jnp.asarray(np.array([-1, 5], np.int32))
        olds = jnp.asarray(np.array([-1, -1], np.int32))
        news = jnp.asarray(np.array([42, 42], np.int32))
        out = np.asarray(M._rename_slots(vals, olds, news))
        np.testing.assert_array_equal(out, [-1, 5])

    def test_no_chaining_within_one_call(self):
        # (3 -> 5) and (5 -> 8) applied simultaneously: a 3 becomes 5, NOT 8
        # (callers pre-resolve chains by pointer jumping)
        vals = jnp.asarray(np.array([3, 5], np.int32))
        olds = jnp.asarray(np.array([3, 5], np.int32))
        news = jnp.asarray(np.array([5, 8], np.int32))
        out = np.asarray(M._rename_slots(vals, olds, news))
        np.testing.assert_array_equal(out, [5, 8])


class TestThresholdKeep:
    def _table(self, NID, areas, alive_ids):
        area = np.zeros((NID,), np.float32)
        for i, a in areas.items():
            area[i] = a
        alive = np.zeros((NID,), bool)
        alive[list(alive_ids)] = True
        return jnp.asarray(area), jnp.asarray(alive)

    def test_fraction_of_smaller_object(self):
        # reference rule: overlap / min(area_a, area_b) >= threshold
        NID = 16
        area, alive = self._table(NID, {1: 100.0, 2: 10.0}, {1, 2})
        ga = jnp.asarray(np.array([1, 1], np.int32))
        gb = jnp.asarray(np.array([2, 2], np.int32))
        w = jnp.asarray(np.array([5.0, 2.0], np.float32))
        keep = np.asarray(M._threshold_keep(ga, gb, w, area, alive, jnp.float32(0.5), NID))
        # 5/10 = 0.5 passes; 2/10 = 0.2 fails
        assert keep[0] and not keep[1]

    def test_dead_object_pairs_dropped(self):
        NID = 8
        area, alive = self._table(NID, {1: 4.0, 2: 4.0, 3: 4.0}, {1, 3})
        ga = jnp.asarray(np.array([1, 1], np.int32))
        gb = jnp.asarray(np.array([2, 3], np.int32))
        w = jnp.asarray(np.array([4.0, 4.0], np.float32))
        keep = np.asarray(M._threshold_keep(ga, gb, w, area, alive, jnp.float32(0.1), NID))
        assert not keep[0] and keep[1]

    def test_invalid_and_zero_area_slots_dropped(self):
        NID = 8
        area, alive = self._table(NID, {1: 0.0, 2: 1.0}, {1, 2})
        ga = jnp.asarray(np.array([-1, 1], np.int32))
        gb = jnp.asarray(np.array([2, 2], np.int32))
        w = jnp.asarray(np.array([1.0, 1.0], np.float32))
        keep = np.asarray(M._threshold_keep(ga, gb, w, area, alive, jnp.float32(0.0), NID))
        assert not keep.any()  # slot 0 invalid; slot 1 has min_area == 0

    def test_zero_threshold_keeps_any_positive_overlap(self):
        NID = 8
        area, alive = self._table(NID, {1: 50.0, 2: 50.0}, {1, 2})
        ga = jnp.asarray(np.array([1], np.int32))
        gb = jnp.asarray(np.array([2], np.int32))
        w = jnp.asarray(np.array([1e-6], np.float32))
        keep = np.asarray(M._threshold_keep(ga, gb, w, area, alive, jnp.float32(0.0), NID))
        assert keep[0]


class TestMapPairsToGlobal:
    def test_maps_locals_through_rows_and_restores_invariant(self):
        MP = 6
        # local pairs (2, 1) and (1, 2) with local->global rows
        pa = jnp.asarray(slots(np.array([2, 1], np.int32), MP, -1))
        pb = jnp.asarray(slots(np.array([1, 2], np.int32), MP, -1))
        pw = jnp.asarray(slots(np.array([3.0, 4.0], np.float32), MP, np.float32(0)))
        row_a = jnp.asarray(np.array([0, 10, 20, 0], np.int32))  # local 1->10, 2->20
        row_b = jnp.asarray(np.array([0, 7, 9, 0], np.int32))    # local 1->7, 2->9
        ga, gb, w = (np.asarray(x) for x in M._map_pairs_to_global(pa, pb, pw, row_a, row_b, MP))
        assert list(ga[:2]) == [10, 20] and list(gb[:2]) == [9, 7]
        np.testing.assert_array_equal(w[:2], [4.0, 3.0])

    def test_consolidated_locals_aggregate(self):
        MP = 4
        # two locals mapped onto ONE consolidated global id -> weights sum
        pa = jnp.asarray(slots(np.array([1, 2], np.int32), MP, -1))
        pb = jnp.asarray(slots(np.array([1, 1], np.int32), MP, -1))
        pw = jnp.asarray(slots(np.array([2.0, 5.0], np.float32), MP, np.float32(0)))
        row_a = jnp.asarray(np.array([0, 33, 33, 0], np.int32))  # both locals -> 33
        row_b = jnp.asarray(np.array([0, 8, 0, 0], np.int32))
        ga, gb, w = (np.asarray(x) for x in M._map_pairs_to_global(pa, pb, pw, row_a, row_b, MP))
        assert ga[0] == 33 and gb[0] == 8 and w[0] == 7.0
        assert (ga[1:] == -1).all()
