"""Parity odds and ends: summarize output, strand filters, genbank CSV
resolution (mocked), CLI version/help, index subcommand."""
import json
import os
from unittest import mock

import numpy as np
import pytest

from nimble_tpu.__main__ import main as cli
from nimble_tpu.align.pipeline import TSV_HEADER
from nimble_tpu.report.tsv import write_alignment_tsv


def test_report_summarize(tmp_path):
    tsv = str(tmp_path / "r.tsv")
    rows = [
        ["A", 10, "c1", "U1", "c1", "U1", 1, 2, 5, 5, "geneA"],
        ["A", 20, "c1", "U1", "c1", "U1", 1, 2, 5, 5, "geneA"],
        ["B", 30, "c1", "U2", "c1", "U2", 1, 2, 5, 5, "geneB"],
    ]
    write_alignment_tsv(tsv, TSV_HEADER, rows)
    out = str(tmp_path / "counts.tsv")
    cwd = os.getcwd()
    os.chdir(str(tmp_path))
    try:
        assert cli(["report", "-i", tsv, "-o", "counts.tsv", "-s", "r1_GN"]) == 0
        # reference prepends the literal prefix to the output path
        assert os.path.exists("summarize.counts.tsv")
        lines = open("summarize.counts.tsv").read().strip().split("\n")
        assert lines[0] == "umi\tr1_GN"
        by_umi = dict(l.split("\t") for l in lines[1:])
        assert by_umi["U1"] == "geneA(2)"
        assert by_umi["U2"] == "geneB(1)"
    finally:
        os.chdir(cwd)


def test_strand_filters():
    from nimble_tpu import seq as seqmod
    from nimble_tpu.align.engine import AlignEngine
    from nimble_tpu.config import Config, Data
    from nimble_tpu.index.builder import build_index

    rng = np.random.default_rng(5)
    ref = "".join("ACGT"[i] for i in rng.integers(0, 4, size=400))
    data = Data()
    data.columns[0].append("lib")
    data.columns[1].append("f0")
    data.columns[2].append(str(len(ref)))
    data.columns[3].append(ref)
    cfg = Config(score_threshold=0, score_filter=0, score_percent=0.0)
    index = build_index(data, cfg, k=21)

    fwd_read = ref[50:150]
    rev_read = seqmod.revcomp(fwd_read)
    codes, lens = seqmod.encode_batch([fwd_read, rev_read], 100)

    for strand, expect_pass in [
        ("unstranded", [True, True]),
        ("fiveprime", [True, False]),  # forward-only scoring
        ("threeprime", [False, True]),  # reverse-only scoring
    ]:
        engine = AlignEngine(index, cfg, strand_filter=strand, chunk_size=2, max_len=100)
        out = engine.align_batch(codes, lens)
        got = (out["score"] == 100).tolist()
        assert got == expect_pass, (strand, out["score"])


def test_genbank_csv_resolution(tmp_path, monkeypatch):
    from nimble_tpu import remote

    def fake_get_ids(term):
        assert term == "AB12345"
        return ["999"]

    def fake_fetch(ids, string_id, subset):
        seq = "ACGTACGTACGTACGTACGT"
        if subset:
            start, end = subset.split("-")
            seq = seq[int(start) : int(end)]
        return len(seq), seq

    monkeypatch.setattr(remote, "get_ids", fake_get_ids)
    monkeypatch.setattr(remote, "fetch_sequence", fake_fetch)

    csv_path = str(tmp_path / "lib.csv")
    with open(csv_path, "w") as f:
        f.write("name,sequence,lineage\n")
        f.write("g1,genbank://AB12345,L1\n")
        f.write("g2,genbank://AB12345:2-10,L1\n")

    from nimble_tpu.library import parse_csv

    data, _ = parse_csv(csv_path, has_sequences=True)
    assert data.sequences[0] == "ACGTACGTACGTACGTACGT"
    assert data.sequences[1] == "GTACGTAC"
    assert data.column("nt_length") == ["20", "8"]


def test_cli_download_noop(capsys):
    assert cli(["download"]) == 0
    assert "built in" in capsys.readouterr().out


def test_cli_index_subcommand(tmp_path):
    from nimble_tpu.io.fasta import write_fasta

    rng = np.random.default_rng(1)
    fasta = str(tmp_path / "l.fasta")
    write_fasta(fasta, [("f0", "".join("ACGT"[i] for i in rng.integers(0, 4, 200)))])
    lib = str(tmp_path / "l.json")
    assert cli(["generate", "--file", fasta, "--output_path", lib]) == 0
    idx_path = str(tmp_path / "l.npz")
    assert cli(["index", "--reference", lib, "--output", idx_path]) == 0
    from nimble_tpu.index.builder import KmerIndex

    idx = KmerIndex.load(idx_path)
    assert idx.n_features == 1
