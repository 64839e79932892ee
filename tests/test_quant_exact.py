"""Exactness tests for the quantification pipeline.

These port the semantics of the reference's unit suite (reference:
test/test.py) onto nimble_tpu.quant.exact: same inputs, same expected count
tables / filtered feature sets, including the reference's subtle edge cases
(ties at threshold survive via strict '<'; zero-score rows die; duplicate
features within a row are deduped by the set ops; ambiguous classes are
legitimate output features).
"""
import pytest

from nimble_tpu.quant.exact import (
    convert_rows_to_proper_umi,
    count_matrix,
    intersect_lists,
    per_umi_thresholding,
    report_rows,
    umi_intersection,
)


def run_pipeline(rows, threshold, disable=False):
    counts, _ = report_rows(rows, threshold, disable_thresholding=disable)
    return counts


def filtered_features_set(result):
    feats = set()
    for row in result:
        feats.update(row[4].split(","))
    return feats


class TestThresholding:
    def test_basic(self):
        # reference: test/test.py:10-30
        rows = [
            ("cell1", "UMI1", "A,B", 10),
            ("cell1", "UMI1", "A,C", 20),
        ]
        result = per_umi_thresholding(rows, 0.2)
        assert [(r[0], r[1], r[2], r[3], r[4]) for r in result] == [
            ("cell1", "UMI1", "A,B", 10, "A"),
            ("cell1", "UMI1", "A,C", 20, "A,C"),
        ]

    def test_all_below_threshold(self):
        # reference: test/test.py:32-45
        rows = [("cell1", "UMI1", "A,B,C", 3)]
        assert per_umi_thresholding(rows, 0.4) == []

    def test_single_feature(self):
        # reference: test/test.py:47-60
        rows = [("cell1", "UMI1", "A", 10)]
        result = per_umi_thresholding(rows, 0.9)
        assert result[0][4] == "A"

    def test_high_threshold(self):
        # reference: test/test.py:195-207
        rows = [
            ("cell1", "UMI1", "A,B", 100),
            ("cell1", "UMI1", "A,B,C,D", 100),
        ]
        result = per_umi_thresholding(rows, 0.3)
        assert set(result[0][4].split(",")) == {"A", "B"}

    def test_non_uniform_scores(self):
        # reference: test/test.py:209-222
        rows = [
            ("cell1", "UMI1", "A", 80),
            ("cell1", "UMI1", "B,C", 20),
        ]
        result = per_umi_thresholding(rows, 0.25)
        assert filtered_features_set(result) == {"A"}

    def test_complex_scores(self):
        # reference: test/test.py:243-259
        rows = [
            ("cell1", "UMI1", "A,B", 10),
            ("cell1", "UMI1", "A,C", 15),
            ("cell1", "UMI1", "B,C,D", 5),
            ("cell1", "UMI1", "D,E", 20),
        ]
        result = per_umi_thresholding(rows, 0.2)
        assert filtered_features_set(result) == {"A", "E", "D"}

    def test_tie_scores_at_threshold_survive(self):
        # strict '<' at the threshold boundary; reference: test/test.py:324-337
        rows = [("cell1", "UMI1", "A,B", 10)]
        result = per_umi_thresholding(rows, 0.5)
        assert set(result[0][4].split(",")) == {"A", "B"}

    def test_zero_scores(self):
        # reference: test/test.py:339-354
        rows = [
            ("cell1", "UMI1", "A,B", 0),
            ("cell1", "UMI1", "C,D", 20),
        ]
        result = per_umi_thresholding(rows, 0.1)
        assert filtered_features_set(result) == {"C", "D"}

    def test_duplicate_features_in_row(self):
        # reference: test/test.py:414-429
        rows = [("cell1", "UMI1", "A,A,B", 15)]
        result = per_umi_thresholding(rows, 0.2)
        assert set(result[0][4].split(",")) == {"A", "B"}

    def test_large_scores(self):
        # reference: test/test.py:481-495
        rows = [
            ("cell1", "UMI1", "A,B,C", 1e12),
            ("cell1", "UMI1", "C,D,E", 1e12),
        ]
        result = per_umi_thresholding(rows, 0.2)
        assert filtered_features_set(result) == {"C"}

    def test_decimal_scores(self):
        # reference: test/test.py:497-511
        rows = [
            ("cell1", "UMI1", "A,B", 0.6),
            ("cell1", "UMI1", "A,C", 0.4),
        ]
        result = per_umi_thresholding(rows, 0.5)
        assert filtered_features_set(result) == {"A"}


class TestIntersection:
    def test_basic(self):
        # reference: test/test.py:62-78
        rows = [
            ("cell1", "UMI1", "x", 0, "A,B"),
            ("cell1", "UMI1", "y", 0, "A,C"),
            ("cell1", "UMI1", "z", 0, "A,D"),
        ]
        result = umi_intersection(rows)
        assert result[0][2] == ["A"]

    def test_no_common_features(self):
        # reference: test/test.py:80-91
        rows = [
            ("cell1", "UMI1", "x", 0, "A,B"),
            ("cell1", "UMI1", "y", 0, "C,D"),
        ]
        result = umi_intersection(rows)
        assert result[0][2] == []

    def test_single_read(self):
        # reference: test/test.py:224-235
        rows = [("cell1", "UMI1", "x", 0, "A,B,C")]
        result = umi_intersection(rows)
        assert set(result[0][2]) == {"A", "B", "C"}

    def test_complex(self):
        # reference: test/test.py:261-272
        rows = [
            ("cell1", "UMI1", "a", 0, "A,B,C"),
            ("cell1", "UMI1", "b", 0, "A,C"),
            ("cell1", "UMI1", "c", 0, "B,C,D"),
            ("cell1", "UMI1", "d", 0, "C,D,E"),
        ]
        result = umi_intersection(rows)
        assert result[0][2] == ["C"]

    def test_empty_input(self):
        assert umi_intersection([]) == []

    def test_intersect_lists_empty(self):
        # reference: test/test.py:93-98
        assert intersect_lists([]) == []

    def test_intersect_lists_single(self):
        # reference: test/test.py:100-105
        assert sorted(intersect_lists([["A", "B", "C"]])) == ["A", "B", "C"]


class TestPipeline:
    def test_multiple_cells(self):
        # reference: test/test.py:107-138
        rows = [
            ("cell1", "UMI1", "A,B", 10),
            ("cell1", "UMI1", "A,C", 20),
            ("cell2", "UMI2", "D,E", 30),
            ("cell2", "UMI2", "D,F", 40),
            ("cell3", "UMI3", "G", 50),
        ]
        assert run_pipeline(rows, 0.2) == [
            ("A", 1, "cell1"),
            ("D", 1, "cell2"),
            ("G", 1, "cell3"),
        ]

    def test_no_features_remaining(self):
        # reference: test/test.py:140-160
        rows = [("cell1", "UMI1", "A,B,C", 3)]
        assert run_pipeline(rows, 0.4) == []

    def test_duplicate_reads_merge(self):
        # duplicate (cb,umi,features) rows merge with summed score, and the
        # ambiguous class "A,B" is a legitimate output feature;
        # reference: test/test.py:162-193
        rows = [
            ("cell1", "UMI1", "A,B", 10),
            ("cell1", "UMI1", "A,B", 10),
        ]
        assert run_pipeline(rows, 0.1) == [("A,B", 1, "cell1")]

    def test_integration_complex(self):
        # reference: test/test.py:274-322
        rows = [
            ("cell1", "UMI1", "A,B", 10),
            ("cell1", "UMI1", "A,C", 20),
            ("cell1", "UMI2", "B,D", 15),
            ("cell2", "UMI3", "E,F", 5),
            ("cell2", "UMI3", "F,G", 35),
            ("cell3", "UMI4", "H,I", 25),
            ("cell3", "UMI5", "I,J", 15),
            ("cell3", "UMI5", "H,J", 10),
        ]
        expected = sorted(
            [
                ("A", 1, "cell1"),
                ("B,D", 1, "cell1"),
                ("F", 1, "cell2"),
                ("H,I", 1, "cell3"),
                ("J", 1, "cell3"),
            ],
            key=lambda r: (r[2], r[0]),
        )
        assert sorted(run_pipeline(rows, 0.2), key=lambda r: (r[2], r[0])) == expected

    def test_no_thresholding_threshold_zero(self):
        # threshold=0 keeps everything; reference: test/test.py:365-412
        rows = [
            ("cell1", "UMI1", "A,B", 10),
            ("cell2", "UMI2", "C,D", 20),
            ("cell2", "UMI2", "D,E", 30),
            ("cell3", "UMI3", "F,G", 40),
        ]
        expected = [
            ("A,B", 1, "cell1"),
            ("D", 1, "cell2"),
            ("F,G", 1, "cell3"),
        ]
        assert sorted(run_pipeline(rows, 0.0), key=lambda r: (r[2], r[0])) == expected

    def test_realistic_data(self):
        # reference: test/test.py:431-479
        rows = [
            ("cell1", "UMI1", "A", 10),
            ("cell1", "UMI1", "B", 5),
            ("cell1", "UMI2", "A,B", 8),
            ("cell1", "UMI2", "B,C", 12),
            ("cell1", "UMI2", "C", 3),
            ("cell2", "UMI3", "D", 20),
            ("cell2", "UMI3", "E", 15),
            ("cell2", "UMI4", "F", 25),
            ("cell2", "UMI4", "F,G", 5),
            ("cell3", "UMI5", "H,I", 10),
            ("cell3", "UMI5", "I,J", 15),
            ("cell3", "UMI5", "H,J", 5),
        ]
        assert run_pipeline(rows, 0.15) == [("F", 1, "cell2")]

    def test_disable_thresholding(self):
        rows = [
            ("cell1", "UMI1", "A,B,C", 1),  # would die under threshold 0.4
        ]
        assert run_pipeline(rows, 0.4, disable=True) == [("A,B,C", 1, "cell1")]

    def test_unsorted_features_are_sorted(self):
        rows = [
            ("cell1", "UMI1", "B,A", 10),
            ("cell1", "UMI1", "A,B", 10),
        ]
        merged = convert_rows_to_proper_umi(rows)
        assert merged == [("cell1", "UMI1", "A,B", 20)]

    def test_count_matrix_multiple_umis_per_feature(self):
        intersections = [
            ("cell1", "UMI1", ["A"]),
            ("cell1", "UMI2", ["A"]),
            ("cell1", "UMI3", []),
            ("cell2", "UMI4", ["A"]),
        ]
        rows, dropped = count_matrix(intersections)
        assert rows == [("A", 2, "cell1"), ("A", 1, "cell2")]
        assert dropped == 1
