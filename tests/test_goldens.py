"""Frozen aligner-contract goldens (VERDICT r4 item 3): byte-diff live
align CLI output against the committed golden TSVs in tests/goldens/.

Each golden pins one reference Config field at a non-default value
(reference: nimble/types.py:10-26) on a committed synthetic paired-end
workload (scripts/make_goldens.py). A failure here means the inferred
aligner contract CHANGED — if the change is deliberate, regenerate with
`python scripts/make_goldens.py` and commit the diff; never "fix" a
golden by hand."""
import os
import pathlib
import shutil

import pytest

from nimble_tpu.__main__ import main as cli

GOLD = pathlib.Path(__file__).resolve().parent / "goldens"

FLAG_CASES = {
    "probe_mono": ["--probe", "mono"],
    "strand_fiveprime": ["--strand_filter", "fiveprime"],
}
SINGLE_END_CASES = {"strand_fiveprime"}


def golden_cases():
    if not GOLD.is_dir():
        return []
    cases = sorted(
        p.stem[len("golden_"):]
        for p in GOLD.glob("golden_*.tsv")
        if p.stem != "golden_legacy_filters"
    )
    return cases


@pytest.fixture(scope="module")
def staging(tmp_path_factory):
    """Copy the committed workload into tmp so index sidecars never land in
    the repo tree."""
    root = tmp_path_factory.mktemp("goldens")
    for p in GOLD.glob("*.json"):
        shutil.copy(p, root / p.name)
    for p in ("r1.fastq", "r2.fastq"):
        shutil.copy(GOLD / p, root / p)
    return root


@pytest.mark.parametrize("case", golden_cases())
def test_golden(case, staging):
    lib_name = f"lib_{case}.json" if (GOLD / f"lib_{case}.json").exists() else "lib_base.json"
    out = staging / f"out_{case}.tsv"
    inputs = [str(staging / "r1.fastq")]
    if case not in SINGLE_END_CASES:
        inputs.append(str(staging / "r2.fastq"))
    rc = cli(
        ["align", "--reference", str(staging / lib_name),
         "--output", str(out), "--input", *inputs,
         *FLAG_CASES.get(case, [])]
    )
    assert rc == 0
    got = out.read_bytes()
    want = (GOLD / f"golden_{case}.tsv").read_bytes()
    assert got == want, (
        f"align output for case {case!r} drifted from the committed golden "
        f"(tests/goldens/golden_{case}.tsv). If deliberate, regenerate via "
        "scripts/make_goldens.py and commit."
    )


def test_golden_legacy_filters(staging):
    """Config.filters chain through the legacy bulk report path."""
    from nimble_tpu.legacy import bulk_report, parse_filter_config

    out = staging / "legacy.tsv"
    methods, values = parse_filter_config(str(staging / "lib_filters_minct.json"))
    bulk_report(methods, values, str(GOLD / "golden_base.tsv"), str(out))
    assert out.read_bytes() == (GOLD / "golden_legacy_filters.tsv").read_bytes()


def test_goldens_exist_and_nonvacuous():
    """The matrix covers every reference Config field and most goldens
    actually differ from base (a golden equal to base pins nothing)."""
    cases = golden_cases()
    assert len(cases) >= 16
    base = (GOLD / "golden_base.tsv").read_bytes()
    diff = [c for c in cases if (GOLD / f"golden_{c}.tsv").read_bytes() != base]
    # data_type is semantics-free by design; everything else must bite
    assert len(diff) >= len(cases) - 3, f"too many vacuous goldens: {set(cases) - set(diff)}"
