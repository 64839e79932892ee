"""Differential test: fastq-to-bam vs the REFERENCE's own processor.

The reference's fastq_barcode_processor.py is pure Python over pysam +
biopython record objects; neither dependency is installed here, so we stub
just the object surfaces the reference touches (pysam.AlignedSegment
attribute bag, Bio record .id/.seq/.letter_annotations) and run the
reference's load_cb_whitelist / process_pair UNCHANGED
(/root/reference/nimble/fastq_barcode_processor.py:73-209) on the same
synthetic R1/R2 + whitelist as our fastq_to_bam_with_barcodes, then compare
BAM records field by field (name, flag, seq, quals, CB, UB) and the skip
decisions.

Known, documented divergence (nimble_tpu/barcode.py module docstring): when
multiple Hamming-1 candidates tie at the SAME lowest quality, the reference
picks by Python set-iteration order (arbitrary); we pick deterministically
by (position, base). The fixture below avoids constructing such ties except
in the test that pins the divergence explicitly.
"""
import sys
import types

import numpy as np
import pytest

REFERENCE_PATH = "/root/reference"


class FakeSegment:
    def __init__(self):
        self.query_name = None
        self.query_sequence = None
        self.query_qualities = None
        self.flag = 0
        self.reference_id = -1
        self.reference_start = -1
        self.mapping_quality = 0
        self.tags = {}

    def set_tag(self, k, v):
        self.tags[k] = v

    def get_tag(self, k):
        return self.tags[k]


class FakeBioRecord:
    def __init__(self, name, seq, quals):
        self.id = name
        self.seq = seq
        self.letter_annotations = {"phred_quality": list(quals)}


def _load_reference_processor():
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    for mod in ("pysam", "Bio"):
        if mod not in sys.modules:
            try:
                __import__(mod)
            except ImportError:
                stub = types.ModuleType(mod)
                if mod == "pysam":
                    stub.AlignedSegment = FakeSegment
                else:
                    stub.SeqIO = types.ModuleType("Bio.SeqIO")
                sys.modules[mod] = stub
    try:
        from nimble import fastq_barcode_processor as ref

        return ref
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference processor unavailable: {e}")


def make_workload(rng, whitelist, n=400, cb_len=16, umi_len=12):
    """Read pairs exercising every branch: exact CB, unique 1-edit,
    multi-candidate distinct-quality pick, no candidate, N base, name
    mismatch, too-short, no-remaining-seq."""
    bases = "ACGT"

    def rand_seq(m):
        return "".join(bases[i] for i in rng.integers(0, 4, size=m))

    pairs = []  # (r1_name, r1_seq, r1_quals, r2_name, r2_seq, r2_quals)
    wl = list(whitelist)
    for i in range(n):
        kind = i % 8
        cb = wl[int(rng.integers(0, len(wl)))]
        quals = [int(q) for q in rng.integers(20, 40, size=cb_len)]
        if kind == 1:  # single substitution -> correctable
            p = int(rng.integers(0, cb_len))
            alt = bases[(bases.index(cb[p]) + 1 + int(rng.integers(0, 3))) % 4]
            cb = cb[:p] + alt + cb[p + 1 :]
            quals[p] = 5
        elif kind == 2:  # N in the CB
            p = int(rng.integers(0, cb_len))
            cb = cb[:p] + "N" + cb[p + 1 :]
            quals[p] = 3
        elif kind == 3:  # garbage CB: likely no candidate
            cb = rand_seq(cb_len)
        umi = rand_seq(umi_len)
        cdna = rand_seq(60) if kind != 5 else ""
        r1_seq = cb + umi + cdna
        if kind == 4:  # too short (no full CB+UMI)
            r1_seq = r1_seq[: cb_len + umi_len - 3]
        r1_quals = quals + [int(q) for q in rng.integers(20, 40, size=len(r1_seq) - min(len(r1_seq), cb_len))]
        r1_quals = r1_quals[: len(r1_seq)]
        r2_seq = rand_seq(70)
        r2_quals = [int(q) for q in rng.integers(20, 40, size=70)]
        r1_name = f"pair{i}/1"
        r2_name = f"pair{i}/2" if kind != 6 else f"other{i}/2"
        pairs.append((r1_name, r1_seq, r1_quals, r2_name, r2_seq, r2_quals))
    return pairs


@pytest.fixture(scope="module")
def whitelist():
    rng = np.random.default_rng(42)
    bases = "ACGT"
    wl = sorted(
        {
            "".join(bases[i] for i in rng.integers(0, 4, size=16))
            for _ in range(500)
        }
    )
    return wl


def run_reference(ref, pairs, whitelist):
    """Reference process_pair over all pairs -> list of segment-pairs/None."""
    hamming_index = ref.build_hamming_index(set(whitelist))
    cache = {}
    stats = {
        k: 0
        for k in (
            "name_mismatch",
            "too_short",
            "no_remaining_seq",
            "cb_no_correction",
            "cb_perfect_match",
            "cb_corrected",
        )
    }
    out = []
    for r1n, r1s, r1q, r2n, r2s, r2q in pairs:
        rec = ref.process_pair(
            FakeBioRecord(r1n, r1s, r1q),
            FakeBioRecord(r2n, r2s, r2q),
            set(whitelist),
            hamming_index,
            cache,
            stats,
        )
        out.append(rec)
    return out, stats


def run_ours(tmp_path, pairs, whitelist):
    from nimble_tpu.barcode import fastq_to_bam_with_barcodes
    from nimble_tpu.io.bam import BamReader
    from nimble_tpu.io.fastq import write_fastq

    r1 = str(tmp_path / "r1.fastq")
    r2 = str(tmp_path / "r2.fastq.gz")
    wl_path = str(tmp_path / "wl.txt")
    write_fastq(
        r1, [(n, s, "".join(chr(33 + q) for q in qs)) for n, s, qs, _, _, _ in pairs]
    )
    write_fastq(
        r2, [(n, s, "".join(chr(33 + q) for q in qs)) for _, _, _, n, s, qs in pairs]
    )
    with open(wl_path, "w") as f:
        f.write("\n".join(whitelist) + "\n")
    bam = str(tmp_path / "out.bam")
    fastq_to_bam_with_barcodes(r1, r2, wl_path, bam)
    reader = BamReader(bam)
    recs = list(reader)
    reader.close()
    return recs


def test_fastq_to_bam_matches_reference(tmp_path, whitelist):
    ref = _load_reference_processor()
    rng = np.random.default_rng(0)
    pairs = make_workload(rng, whitelist)

    ref_out, ref_stats = run_reference(ref, pairs, whitelist)
    ours = run_ours(tmp_path, pairs, whitelist)

    ref_records = []
    for rec in ref_out:
        if rec is None:
            continue
        for seg in rec:
            ref_records.append(
                (
                    seg.query_name,
                    seg.flag,
                    seg.query_sequence,
                    bytes(seg.query_qualities),
                    seg.tags["CB"],
                    seg.tags["UB"],
                )
            )
    our_records = [
        (r.name, r.flag, r.seq, r.qual, r.tags["CB"], r.tags["UB"]) for r in ours
    ]
    assert len(our_records) == len(ref_records)
    assert our_records == ref_records


def test_reference_skip_decisions_match(tmp_path, whitelist):
    ref = _load_reference_processor()
    rng = np.random.default_rng(1)
    pairs = make_workload(rng, whitelist, n=320)
    ref_out, ref_stats = run_reference(ref, pairs, whitelist)
    ours = run_ours(tmp_path, pairs, whitelist)
    # one r1+r2 record pair per kept input pair
    assert len(ours) == 2 * sum(1 for r in ref_out if r is not None)
    # every skip class was actually exercised by the fixture
    assert ref_stats["name_mismatch"] > 0
    assert ref_stats["too_short"] > 0
    assert ref_stats["no_remaining_seq"] > 0
    assert ref_stats["cb_no_correction"] > 0
    assert ref_stats["cb_corrected"] > 0


def test_quality_tiebreak_divergence_documented(tmp_path):
    """The ONE known divergence: equal-quality multi-candidate ties. The
    reference resolves by set-iteration order (arbitrary but a member of the
    candidate set); we resolve by (position, base). Pin that our pick is
    always a legitimate candidate the reference could also have made."""
    ref = _load_reference_processor()
    # whitelist engineered so raw CB 'AAAA...' (not in list) has two
    # Hamming-1 neighbors differing at DIFFERENT positions with equal quality
    cb_len = 16
    base = "A" * cb_len
    cand1 = "C" + base[1:]
    cand2 = base[:1] + "G" + base[2:]
    wl = [cand1, cand2]
    quals = [30] * cb_len

    hamming_index = ref.build_hamming_index(set(wl))
    got_ref = ref.correct_cell_barcode(base, quals, set(wl), hamming_index, {})
    assert got_ref in (cand1, cand2)

    from nimble_tpu.barcode import BarcodeCorrector, Whitelist
    from nimble_tpu import seq as seqmod

    corr = BarcodeCorrector(Whitelist(wl, cb_len))
    got = corr.correct_chunk(
        seqmod.encode(base)[None, :],
        np.full((1, cb_len), 30, dtype=np.uint8),
        {"cb_perfect_match": 0, "cb_corrected": 0, "cb_no_correction": 0},
    )[0]
    # deterministic (position, base) order -> position 0 wins
    assert got == cand1
    assert got in (cand1, cand2)
