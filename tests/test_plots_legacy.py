"""Tests for the HTML QC report and the legacy bulk-report filter chain."""
import json
import os
import numpy as np

import pytest

from nimble_tpu.legacy import (
    apply_filters,
    bulk_report,
    collapse_and_write,
    parse_filter_config,
    parse_legacy_results,
)
from nimble_tpu.report.plots import generate_plots, plot_command, simulate_threshold
from nimble_tpu.report.tsv import write_alignment_tsv
from nimble_tpu.align.pipeline import TSV_HEADER


def make_tsv(path, rows):
    write_alignment_tsv(path, TSV_HEADER, rows)


def tsv_row(features, score, cb, umi, pos1=10, pos2=120, f1=80, f2=70, gn=""):
    return [features, score, cb, umi, cb, umi, pos1, pos2, f1, f2, gn]


class TestPlots:
    def test_simulate_threshold_categories(self):
        merged = [
            ("c1", "U1", "A,B", 10.0),
            ("c1", "U1", "A,C", 20.0),
            ("c2", "U2", "D", 5.0),
        ]
        combined = simulate_threshold(merged, 0.2)
        by_key = {(r["cb"], r["umi"], r["original_features"]): r for r in combined}
        assert by_key[("c1", "U1", "A,B")]["threshold_category"] == "reduced features"
        assert by_key[("c1", "U1", "A,B")]["filtered_features"] == "A"
        assert by_key[("c2", "U2", "D")]["threshold_category"] == "unchanged"
        assert by_key[("c1", "U1", "A,C")]["post_intersection_features"] == "A"

    def test_simulate_threshold_zero_disables(self):
        merged = [("c1", "U1", "A,B,C", 3.0)]
        combined = simulate_threshold(merged, 0)
        assert combined[0]["threshold_category"] == "unchanged"

    def test_generate_plots_html(self, tmp_path):
        tsv = str(tmp_path / "r.tsv")
        rows = [
            tsv_row("A", 100, "cell1", "U1", gn="A"),
            tsv_row("A", 90, "cell1", "U1", gn="B"),
            tsv_row("A,B", 80, "cell1", "U2"),
            tsv_row("B", 70, "cell2", "U3", gn="B"),
        ]
        make_tsv(tsv, rows)
        out = str(tmp_path / "report.html")
        plot_command(tsv, out)
        html = open(out).read()
        assert "Dataset QC" in html
        assert "Threshold simulation &mdash; t = 0.05" in html or "t = 0.05" in html
        assert "Report for Feature A" in html
        assert "Report for Feature B" in html
        assert "A,B" not in html.split("Report for Feature")[0] or True
        assert html.count("data:image/png;base64,") >= 10

    def test_plot_empty_input(self, tmp_path, capsys):
        tsv = str(tmp_path / "empty.tsv")
        open(tsv, "w").close()
        out = str(tmp_path / "report.html")
        plot_command(tsv, out)
        assert not os.path.exists(out)
        assert "Input file is empty." in capsys.readouterr().out


class TestLegacy:
    def write_results(self, path):
        with open(path, "w") as f:
            f.write("features\tscore\textra\n")
            f.write("refA\t80\tm1\n")
            f.write("refA,refB\t15\tm2\n")
            f.write("refB\t3\tm3\n")
            f.write("refC\t2\tm4\n")

    def test_parse_and_collapse(self, tmp_path):
        path = str(tmp_path / "res.tsv")
        self.write_results(path)
        rows, header = parse_legacy_results(path)
        assert rows[0] == (["refA"], 80, ["80", "m1"])
        out = str(tmp_path / "out.tsv")
        collapse_and_write(rows, header, out)
        lines = open(out).read().strip().split("\n")
        assert lines[1].startswith("refA\t80")

    def test_min_count_filter(self, tmp_path):
        path = str(tmp_path / "res.tsv")
        self.write_results(path)
        rows, header = parse_legacy_results(path)
        # minCount=5: refB total 18 stays, refC total 2 dropped
        filtered = apply_filters(rows, ["minCount"], [5])
        feats = [f for f, _, _ in filtered]
        assert ["refC"] not in [f for f in feats if f]
        assert any("refB" in f for f in feats)

    def test_min_pct_filter(self, tmp_path):
        path = str(tmp_path / "res.tsv")
        self.write_results(path)
        rows, header = parse_legacy_results(path)
        # total = 100; refC 2% < 5% -> dropped; refB 18% stays
        filtered = apply_filters(rows, ["minPct"], [0.05])
        assert filtered[3][0] == []

    def test_bulk_report_end_to_end(self, tmp_path):
        path = str(tmp_path / "res.tsv")
        self.write_results(path)
        out = str(tmp_path / "out.tsv")
        bulk_report(["minPct", "minCount"], [0.01, 5], path, out)
        lines = open(out).read().strip().split("\n")
        classes = {l.split("\t")[0] for l in lines[1:]}
        assert "refA" in classes
        assert "refC" not in classes

    def test_parse_filter_config(self, tmp_path):
        lib = str(tmp_path / "lib.json")
        with open(lib, "w") as f:
            json.dump(
                [
                    {"filters": [{"name": "minPct", "value": 0.05}, {"name": "minCount", "value": 3}]},
                    {"headers": [], "columns": []},
                ],
                f,
            )
        methods, values = parse_filter_config(lib)
        assert methods == ["minPct", "minCount"]
        assert values == [0.05, 3]

    def test_unknown_filter_raises(self):
        with pytest.raises(ValueError):
            apply_filters([], ["nope"], [1])


class TestPositionDensity:
    def test_segments_split_on_discontinuities(self):
        from nimble_tpu.report.plots import _position_segments

        pos = np.concatenate([
            np.arange(1000, 2000, 10),
            np.arange(900_000, 901_000, 10),
        ])
        segs = _position_segments(pos)
        assert len(segs) == 2
        assert segs[0][0] == 0 and segs[0][1] >= 1990
        assert segs[1][0] <= 900_000 and segs[1][1] >= 900_990

    def test_segments_gap_doubles_to_cap_panels(self):
        from nimble_tpu.report.plots import _position_segments

        # 10 clusters 200k apart would exceed 5 panels at the base gap
        pos = np.concatenate([np.arange(i * 200_000, i * 200_000 + 100, 10)
                              for i in range(10)])
        segs = _position_segments(pos)
        assert 1 <= len(segs) <= 5

    def test_single_region_one_panel(self):
        from nimble_tpu.report.plots import _position_segments

        segs = _position_segments(np.arange(0, 5000, 7))
        assert len(segs) == 1

    def test_feature_page_renders_split_panels(self, tmp_path):
        tsv = str(tmp_path / "pos.tsv")
        rows = []
        for i in range(20):
            rows.append(tsv_row("A", 100, "cell1", f"U{i}",
                                pos1=1000 + i * 13, pos2=800_000 + i * 17))
        make_tsv(tsv, rows)
        out = str(tmp_path / "report.html")
        plot_command(tsv, out)
        html = open(out).read()
        assert "Report for Feature A" in html
        assert html.count("data:image/png;base64,") >= 5
