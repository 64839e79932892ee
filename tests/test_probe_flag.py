"""`align --probe {group,mono}` (VERDICT r4 item 4): the probe-path choice
is a CLI decision, not an env var. "group" (default) = g-window group probe;
"mono" = per-k-mer probing, the reference-faithful contract. On clean reads
the two paths must agree; the flag must thread into the index cache key so
group and mono indexes never cross-contaminate the .idx.npz sidecar."""
import os

import numpy as np
import pytest

from nimble_tpu.__main__ import main as cli
from nimble_tpu.align.pipeline import align_files
from nimble_tpu.index.builder import KmerIndex, index_cache_key, index_cache_path
from nimble_tpu.io.fasta import write_fasta
from nimble_tpu.io.fastq import write_fastq


def rand_seq(rng, n):
    return "".join("ACGT"[i] for i in rng.integers(0, 4, size=n))


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("probe_flag")
    rng = np.random.default_rng(23)

    backbone = rand_seq(rng, 600)
    alleles = {}
    for i in range(5):
        s = list(backbone)
        s[70 + i * 90 : 70 + i * 90 + 40] = list(rand_seq(rng, 40))
        alleles[f"allele{i}"] = "".join(s)
    fasta = str(root / "lib.fasta")
    write_fasta(fasta, list(alleles.items()))
    library = str(root / "library.json")
    assert cli(["generate", "--file", fasta, "--output_path", library]) == 0

    from nimble_tpu import seq as seqmod

    reads = []
    names = list(alleles)
    for i in range(48):
        allele = names[i % len(names)]
        start = 20 + (i % 10) * 45
        r = alleles[allele][start : start + 90]
        if i % 4 == 0:
            r = seqmod.revcomp(r)
        reads.append((f"read{i}", r, "I" * 90))
    fastq = str(root / "reads.fastq")
    write_fastq(fastq, reads)
    return {"root": str(root), "library": library, "fastq": fastq}


def test_probe_mono_matches_group_on_clean_reads(workspace):
    root = workspace["root"]
    group_out = os.path.join(root, "group.tsv")
    mono_out = os.path.join(root, "mono.tsv")
    assert cli([
        "align", "--reference", workspace["library"], "--output", group_out,
        "--input", workspace["fastq"], "--probe", "group",
    ]) == 0
    assert cli([
        "align", "--reference", workspace["library"], "--output", mono_out,
        "--input", workspace["fastq"], "--probe", "mono",
    ]) == 0
    with open(group_out) as f, open(mono_out) as m:
        assert f.read() == m.read()
    # mono run leaves a mono index in the sidecar cache: no group entries
    idx = KmerIndex.load(index_cache_path(workspace["library"]))
    assert idx.pair_g == 0 and not idx.has_pairs


def test_probe_flag_keys_the_index_cache(workspace):
    lib = workspace["library"]
    k_group = index_cache_key(lib, None)
    k_mono = index_cache_key(lib, None, 0)
    assert k_group != k_mono
    assert index_cache_key(lib, None, 0) == k_mono  # deterministic

    # `index --probe mono` prebuilds a cache that a mono align reuses
    out = index_cache_path(lib)
    if os.path.exists(out):
        os.remove(out)
    assert cli(["index", "--reference", lib, "--probe", "mono"]) == 0
    mtime = os.path.getmtime(out)
    assert cli([
        "align", "--reference", lib,
        "--output", os.path.join(workspace["root"], "mono2.tsv"),
        "--input", workspace["fastq"], "--probe", "mono",
    ]) == 0
    assert os.path.getmtime(out) == mtime  # reused, not rebuilt


def test_probe_rejects_unknown_value(workspace):
    with pytest.raises(ValueError, match="probe"):
        align_files(
            workspace["library"],
            os.path.join(workspace["root"], "bad.tsv"),
            [workspace["fastq"]],
            probe="weird",
        )
    with pytest.raises(SystemExit):  # argparse choices
        cli([
            "align", "--reference", workspace["library"],
            "--output", os.path.join(workspace["root"], "bad.tsv"),
            "--input", workspace["fastq"], "--probe", "weird",
        ])
