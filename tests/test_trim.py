"""Trim semantics regression lock (VERDICT r4 item 6).

The reference exposes trim_target_length/trim_strictness in the library
Config plus an `align --trim "<TARGET>:<STRICTNESS>"` per-library override
(reference: nimble/types.py:24-25, nimble/__main__.py:191-192,400) but the
backend's rule lives in its absent Rust binary, so nimble_tpu's rule is
[inferred] (documented in README and align/pipeline.trimmed_lens): a read's
3' overhang beyond target_length is cut by round(strictness * overhang)
bases — strictness 1.0 is a hard cap, 0.0 disables trimming, intermediate
values trim proportionally. These tests pin that rule as data so any future
change to it is a deliberate, visible decision."""
import os

import numpy as np
import pytest

from nimble_tpu.__main__ import main as cli
from nimble_tpu.align.pipeline import trimmed_lens
from nimble_tpu.config import Config
from nimble_tpu.io.fasta import write_fasta
from nimble_tpu.io.fastq import write_fastq


# ---------------------------------------------------------------- unit rule


def test_trim_rule_pinned_values():
    lens = np.array([30, 50, 51, 60, 80, 100], dtype=np.int32)
    # strictness 1.0: hard cap at target
    np.testing.assert_array_equal(
        trimmed_lens(lens, (50, 1.0)), [30, 50, 50, 50, 50, 50]
    )
    # strictness 0.5: half the overhang, banker's rounding via np.rint
    # overhangs [0,0,1,10,30,50] -> cuts [0,0,0,5,15,25]
    np.testing.assert_array_equal(
        trimmed_lens(lens, (50, 0.5)), [30, 50, 51, 55, 65, 75]
    )
    # strictness 0: disabled
    np.testing.assert_array_equal(trimmed_lens(lens, (50, 0.0)), lens)
    # target 0: disabled regardless of strictness
    np.testing.assert_array_equal(trimmed_lens(lens, (0, 1.0)), lens)
    # reads at or below target are never touched
    np.testing.assert_array_equal(
        trimmed_lens(np.array([1, 49, 50]), (50, 1.0)), [1, 49, 50]
    )
    # np.rint ties-to-even at .5 cuts: overhang 1 @ 0.5 -> rint(0.5) = 0
    np.testing.assert_array_equal(trimmed_lens(np.array([51]), (50, 0.5)), [51])
    np.testing.assert_array_equal(trimmed_lens(np.array([53]), (50, 0.5)), [51])


def test_trim_preserves_dtype_and_empty():
    lens = np.array([], dtype=np.int32)
    out = trimmed_lens(lens, (50, 1.0))
    assert out.dtype == np.int32 and out.size == 0
    out = trimmed_lens(np.array([70, 90], dtype=np.int32), (60, 0.9))
    assert out.dtype == np.int32


def test_config_trim_spec_default_is_off():
    # reference defaults (trim_target_length=50, trim_strictness=0.9,
    # reference nimble/types.py:24-25) mean "user never configured trimming":
    # trim_spec() returns None so align does NOT silently trim to 50bp
    assert Config().trim_spec() is None
    c = Config()
    c.trim_target_length = 80
    assert c.trim_spec() == (80, 0.9)
    c = Config()
    c.trim_strictness = 1.0
    assert c.trim_spec() == (50, 1.0)


# ------------------------------------------------------------- CLI surface


def rand_seq(rng, n):
    return "".join("ACGT"[i] for i in rng.integers(0, 4, size=n))


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("trim")
    rng = np.random.default_rng(31)
    backbone = rand_seq(rng, 400)
    alleles = {}
    for i in range(3):
        s = list(backbone)
        s[60 + i * 100 : 60 + i * 100 + 40] = list(rand_seq(rng, 40))
        alleles[f"allele{i}"] = "".join(s)
    fasta = str(root / "lib.fasta")
    write_fasta(fasta, list(alleles.items()))
    library = str(root / "library.json")
    assert cli(["generate", "--file", fasta, "--output_path", library]) == 0

    # 120bp reads whose LAST 60bp cross into another allele's variant
    # block region: untrimmed they mismatch (score < len), trimmed to 60
    # they align fully to their source
    reads = []
    names = list(alleles)
    for i in range(30):
        a = names[i % 3]
        start = 20 + (i % 3) * 100
        r = alleles[a][start : start + 120]
        reads.append((f"read{i}", r, "I" * 120))
    fastq = str(root / "reads.fastq")
    write_fastq(fastq, reads)
    return {"root": str(root), "library": library, "fastq": fastq}


def scores(path):
    out = []
    with open(path) as f:
        next(f)  # header
        for line in f:
            parts = line.rstrip("\n").split("\t")
            out.append(int(parts[1]))
    return out


def test_cli_trim_hard_cap(workspace):
    """--trim 60 (missing strictness = hard cap) caps every read at 60bp:
    full-coverage scores drop from 120 to 60."""
    root = workspace["root"]
    untrimmed = os.path.join(root, "untrimmed.tsv")
    trimmed = os.path.join(root, "trimmed.tsv")
    base = [
        "align", "--reference", workspace["library"],
        "--input", workspace["fastq"],
    ]
    assert cli(base + ["--output", untrimmed]) == 0
    assert cli(base + ["--output", trimmed, "--trim", "60"]) == 0
    assert scores(untrimmed) and all(s == 120 for s in scores(untrimmed))
    assert scores(trimmed) and all(s == 60 for s in scores(trimmed))


def test_cli_trim_proportional(workspace):
    """--trim 60:0.5 cuts half the 60bp overhang: scores become 90."""
    root = workspace["root"]
    out = os.path.join(root, "prop.tsv")
    assert cli([
        "align", "--reference", workspace["library"],
        "--input", workspace["fastq"],
        "--output", out, "--trim", "60:0.5",
    ]) == 0
    assert scores(out) and all(s == 90 for s in scores(out))


def test_cli_trim_per_library_list(workspace):
    """Comma-separated --trim entries apply per library in --reference
    order; an empty entry leaves that library untrimmed
    (reference surface: nimble/__main__.py:191-192,400)."""
    import shutil

    root = workspace["root"]
    lib = workspace["library"]
    lib_b = os.path.join(root, "library_b.json")
    shutil.copy(lib, lib_b)
    out = os.path.join(root, "multi.tsv")
    assert cli([
        "align", "--reference", f"{lib},{lib_b}",
        "--input", workspace["fastq"],
        "--output", out, "--trim", ",60",
    ]) == 0
    first = os.path.join(root, "multi.library.tsv")
    second = os.path.join(root, "multi.library_b.tsv")
    assert scores(first) and all(s == 120 for s in scores(first))
    assert scores(second) and all(s == 60 for s in scores(second))


def test_config_trim_spec_drives_align(workspace, tmp_path):
    """A library whose Config carries non-default trim fields trims without
    any --trim flag (pipeline.align_files honors Config.trim_spec)."""
    import json

    root = workspace["root"]
    with open(workspace["library"]) as f:
        config, data = json.load(f)
    config["trim_target_length"] = 60
    config["trim_strictness"] = 1.0
    lib2 = str(tmp_path / "trimlib.json")
    with open(lib2, "w") as f:
        json.dump([config, data], f)
    out = str(tmp_path / "cfg.tsv")
    assert cli([
        "align", "--reference", lib2,
        "--input", workspace["fastq"], "--output", out,
    ]) == 0
    assert scores(out) and all(s == 60 for s in scores(out))
