"""Interval algebra tests (pure, deterministic — SURVEY.md §4 item 2)."""

import pytest

from targetdiarization_tpu.pipeline import intervals as iv


class TestMergeSubtract:
    def test_merge_doc_example(self):
        assert iv.merge_timeranges([(1, 3), (2, 6), (8, 10), (10, 11)]) == [
            (1, 6),
            (8, 11),
        ]

    def test_merge_empty(self):
        assert iv.merge_timeranges([]) == []

    def test_subtract_doc_example(self):
        assert iv.subtract_timeranges([(0, 10)], [(3, 5)]) == [(0, 3), (5, 10)]

    def test_subtract_empty_sub_returns_base(self):
        # deliberate fix of the reference quirk (returns [] there)
        assert iv.subtract_timeranges([(0, 10)], []) == [(0, 10)]

    def test_subtract_full_cover(self):
        assert iv.subtract_timeranges([(2, 4)], [(0, 10)]) == []

    def test_subtract_multiple(self):
        got = iv.subtract_timeranges([(0, 10), (12, 20)], [(1, 2), (15, 16)])
        assert got == [(0, 1), (2, 10), (12, 15), (16, 20)]


class TestIoU:
    def test_single_iou(self):
        assert iv.calc_single_iou((0, 2), (1, 3)) == pytest.approx(1 / 3)
        assert iv.calc_single_iou((0, 1), (2, 3)) == 0.0
        assert iv.calc_single_iou((2, 0), (1, 3)) == pytest.approx(1 / 3)  # unordered

    def test_multi_iou_identity(self):
        s = [(0, 1), (2, 3)]
        assert iv.calc_multi_iou(s, s) == pytest.approx(1.0)

    def test_multi_iou_methods(self):
        preds, gts = [(0, 1)], [(0, 1), (5, 6)]
        assert iv.calc_multi_iou(preds, gts, "pred_to_gt") == pytest.approx(1.0)
        assert iv.calc_multi_iou(preds, gts, "gt_to_pred") == pytest.approx(0.5)
        assert iv.calc_multi_iou(preds, gts) == pytest.approx(0.75)

    def test_multi_iou_raises_on_empty(self):
        with pytest.raises(ValueError):
            iv.calc_multi_iou([], [(0, 1)])

    def test_iou_score_perfect_and_disjoint(self):
        s = [(0, 2), (4, 6)]
        assert iv.calc_iou_score(s, s) == pytest.approx(1.0)
        assert iv.calc_iou_score([(10, 12)], [(0, 2)]) == 0.0

    def test_iou_score_punishes_outside(self):
        inside_only = iv.calc_iou_score([(0, 2)], [(0, 2)])
        with_outside = iv.calc_iou_score([(0, 2), (10, 12)], [(0, 2)])
        assert with_outside < inside_only


class TestKeyMatcher:
    def test_relabels_to_source_keys(self):
        source = {"0": [(0, 5)], "1": [(6, 10)]}
        target = {"A": [(0.1, 4.9)], "B": [(6.2, 9.8)]}
        out = iv.sd_key_matcher(source, target)
        assert set(out) == {"0", "1"}
        assert out["0"] == [(0.1, 4.9)] and out["1"] == [(6.2, 9.8)]

    def test_unmatched_keys_kept(self):
        source = {"0": [(0, 5)]}
        target = {"A": [(0, 5)], "B": [(100, 101)]}
        out = iv.sd_key_matcher(source, target)
        assert out["0"] == [(0, 5)] and out["B"] == [(100, 101)]

    def test_no_match_returns_target(self):
        out = iv.sd_key_matcher({"0": [(0, 1)]}, {"A": [(50, 51)]})
        assert out == {"A": [(50, 51)]}


class TestOverlap:
    def test_get_speaker_overlap(self):
        result = {"0": [(0, 5)], "1": [(4, 8)], "2": [(20, 21)]}
        ov = iv.get_speaker_overlap(result, min_overlap_sec=0.4)
        assert ov == {"0-1": [(4, 5)]}

    def test_min_overlap_filter(self):
        result = {"0": [(0, 5)], "1": [(4.8, 8)]}
        assert iv.get_speaker_overlap(result, min_overlap_sec=0.4) == {}

    def test_apply_od_result(self):
        sd = {"0": [(0, 5)], "1": [(4, 8)]}
        od = {"0-1": [(4, 5)]}
        refined, omap = iv.apply_od_result(sd, od)
        assert (4, 5) in refined["0"] and (4, 5) in refined["1"]
        assert (0, 4) in refined["0"] and (5, 8) in refined["1"]
        # overlap map points at the (4,5) entries of both speakers
        assert len(omap) == 1
        spks = {spk for spk, _ in omap[0]}
        assert spks == {"0", "1"}
        for spk, idx in omap[0]:
            assert refined[spk][idx] == (4, 5)

    def test_apply_od_result_empty(self):
        sd = {"0": [(0, 5)]}
        refined, omap = iv.apply_od_result(sd, {})
        assert refined is sd and omap == []

    def test_subtract_overlap_roundtrip(self):
        sd = {"0": [(0, 5)], "1": [(4, 8)]}
        refined, omap = iv.apply_od_result(sd, {"0-1": [(4, 5)]})
        non_ov = iv.subtract_overlap(refined, omap)
        assert (4, 5) not in non_ov["0"] and (4, 5) not in non_ov["1"]
        only_ov = iv.subtract_overlap(refined, omap, reverse_output=True)
        assert only_ov["0"] == [(4, 5)] and only_ov["1"] == [(4, 5)]


class TestMisc:
    def test_speaker_num(self):
        result = {"0": [(0, 10)], "1": [(11, 11.2)]}
        assert iv.get_speaker_num(result) == 2
        assert iv.get_speaker_num(result, threshold=0.5) == 1
        assert iv.get_speaker_num(result, threshold=0.1) == 2

    def test_parse_segments(self):
        segs = [[0.0, 1.0, 0], [1.0, 2.0, 0], [2.0, 3.0, 1]]
        out = iv.parse_segments(segs)
        assert out == {"0": [(0.0, 1.0), (1.0, 2.0)], "1": [(2.0, 3.0)]}
        combined = iv.parse_segments(segs, combine=True)
        assert combined == {"0": [(0.0, 2.0)], "1": [(2.0, 3.0)]}
        single = iv.parse_segments(segs, is_single=True)
        assert single == {"0": [(0.0, 3.0)]}
