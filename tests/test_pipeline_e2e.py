"""End-to-end pipeline tests through the CLI surface:
FASTA -> generate -> library.json; 10x FASTQ -> fastq-to-bam -> tagged BAM;
BAM + library -> align -> results TSV; TSV -> report -> count matrix.
(reference dataflow: SURVEY §0.)"""
import json
import os

import numpy as np
import pytest

from nimble_tpu.__main__ import main as cli
from nimble_tpu.io.fasta import write_fasta
from nimble_tpu.io.fastq import write_fastq
from nimble_tpu import seq as seqmod


def rand_seq(rng, n):
    return "".join("ACGT"[i] for i in rng.integers(0, 4, size=n))


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    """A tiny HLA-like library + 10x reads with known ground truth."""
    root = tmp_path_factory.mktemp("e2e")
    rng = np.random.default_rng(99)

    backbone = rand_seq(rng, 600)
    alleles = {}
    for i in range(4):
        s = list(backbone)
        # distinct variant block per allele ensures unique k-mers
        block = rand_seq(rng, 40)
        s[100 + i * 120 : 100 + i * 120 + 40] = list(block)
        alleles[f"allele{i}"] = "".join(s)

    fasta = str(root / "mini_hla.fasta")
    write_fasta(fasta, list(alleles.items()))

    library = str(root / "library.json")
    assert cli(["generate", "--file", fasta, "--output_path", library]) == 0

    # 10x reads: 3 cells x several UMIs, reads from allele variant blocks
    cb_list = ["A" * 16, "C" * 16, "G" * 16]
    reads = []  # (cb, umi, allele, start)
    for ci, cb in enumerate(cb_list):
        for u in range(3):
            allele = f"allele{(ci + u) % 4}"
            umi = rand_seq(np.random.default_rng(1000 + ci * 10 + u), 12)
            # two read-pairs per UMI from the allele's unique block region
            a_idx = int(allele[-1])
            start = 90 + a_idx * 120
            for _ in range(2):
                reads.append((cb, umi, allele, start))

    r1_records = []
    r2_records = []
    for i, (cb, umi, allele, start) in enumerate(reads):
        src = alleles[allele]
        cdna = src[start : start + 80]
        mate = seqmod.revcomp(src[start + 100 : start + 180])
        name = f"read{i}"
        r1_records.append((name + "/1", cb + umi + cdna, "I" * (28 + len(cdna))))
        r2_records.append((name + "/2", mate, "I" * len(mate)))

    r1 = str(root / "r1.fastq")
    r2 = str(root / "r2.fastq")
    wl = str(root / "whitelist.txt")
    write_fastq(r1, r1_records)
    write_fastq(r2, r2_records)
    with open(wl, "w") as f:
        f.write("\n".join(cb_list) + "\n")

    return {
        "root": str(root),
        "fasta": fasta,
        "library": library,
        "r1": r1,
        "r2": r2,
        "whitelist": wl,
        "alleles": alleles,
        "reads": reads,
    }


def test_generate_library_schema(workspace):
    with open(workspace["library"]) as f:
        raw = json.load(f)
    assert raw[0]["score_threshold"] == 20
    assert raw[1]["headers"][1] == "sequence_name"
    assert len(raw[1]["columns"][0]) == 4


def test_full_10x_pipeline(workspace):
    root = workspace["root"]
    bam = os.path.join(root, "tagged.bam")
    assert (
        cli(
            [
                "fastq-to-bam",
                "--r1-fastq",
                workspace["r1"],
                "--r2-fastq",
                workspace["r2"],
                "--map",
                workspace["whitelist"],
                "--output",
                bam,
            ]
        )
        == 0
    )

    results = os.path.join(root, "results.tsv")
    assert (
        cli(
            [
                "align",
                "--reference",
                workspace["library"],
                "--output",
                results,
                "--input",
                bam,
            ]
        )
        == 0
    )

    with open(results) as f:
        lines = f.read().strip().split("\n")
    header = lines[0].split("\t")
    assert header[0] == "nimble_features"
    rows = [dict(zip(header, l.split("\t"))) for l in lines[1:]]
    assert len(rows) == len(workspace["reads"])
    # each row hits its source allele unambiguously (unique variant block)
    for row, (cb, umi, allele, _) in zip(rows, workspace["reads"]):
        assert row["nimble_features"] == allele
        assert row["r1_CB"] == cb
        assert row["r1_UB"] == umi
        assert int(row["nimble_score"]) >= 100

    counts_path = os.path.join(root, "counts.tsv")
    assert cli(["report", "-i", results, "-o", counts_path]) == 0
    with open(counts_path) as f:
        count_rows = [l.split("\t") for l in f.read().strip().split("\n")]
    # expected: each (cb, umi) -> its allele; counts per (cell, allele)
    expected = {}
    for cb, umi, allele, _ in workspace["reads"]:
        expected.setdefault((cb, allele), set()).add(umi)
    got = {(r[2], r[0]): int(r[1]) for r in count_rows}
    assert got == {k: len(v) for k, v in expected.items()}


def test_bulk_fastq_align(workspace):
    """Single-end FASTQ input path (bulk RNA-seq style)."""
    root = workspace["root"]
    rng = np.random.default_rng(5)
    alleles = workspace["alleles"]
    bulk_reads = []
    for i in range(20):
        name = f"bulk{i}"
        allele = f"allele{i % 4}"
        start = 50 + (i % 10) * 30
        bulk_reads.append((name, alleles[allele][start : start + 90], "I" * 90))
    bulk_fq = os.path.join(root, "bulk.fastq")
    write_fastq(bulk_fq, bulk_reads)

    out = os.path.join(root, "bulk_results.tsv")
    assert (
        cli(
            ["align", "--reference", workspace["library"], "--output", out, "--input", bulk_fq]
        )
        == 0
    )
    with open(out) as f:
        lines = f.read().strip().split("\n")
    assert len(lines) == 21  # header + all reads pass (>=25bp coverage)


def test_multi_library_align(workspace, tmp_path):
    """Two libraries in one pass -> suffixed outputs (reference:
    __main__.py:182-189)."""
    root = workspace["root"]
    rng = np.random.default_rng(6)
    other = str(tmp_path / "other_lib.fasta")
    write_fasta(other, [("unrelated", rand_seq(rng, 400))])
    other_lib = str(tmp_path / "other.json")
    assert cli(["generate", "--file", other, "--output_path", other_lib]) == 0

    bulk_fq = os.path.join(root, "bulk.fastq")
    out = os.path.join(root, "multi.tsv")
    assert (
        cli(
            [
                "align",
                "--reference",
                f"{workspace['library']},{other_lib}",
                "--output",
                out,
                "--input",
                bulk_fq,
            ]
        )
        == 0
    )
    lib_name = os.path.splitext(os.path.basename(workspace["library"]))[0]
    out1 = os.path.join(root, f"multi.{lib_name}.tsv")
    out2 = os.path.join(root, "multi.other.tsv")
    assert os.path.exists(out1) and os.path.exists(out2)
    assert len(open(out1).read().strip().split("\n")) == 21
    assert len(open(out2).read().strip().split("\n")) == 1  # header only


def test_report_empty_input(tmp_path):
    empty = str(tmp_path / "empty.tsv")
    open(empty, "w").close()
    out = str(tmp_path / "counts.tsv")
    assert cli(["report", "-i", empty, "-o", out]) == 0
    assert open(out).read() == ""
