"""Compact output wire codec (engine.pack_outputs_compact): the dictionary
format must reconstruct a bit-identical `bits` matrix and the emission-
relevant scalar columns (score, fwd scores, pass_) for any collision load,
spilling to the per-chunk buffer and falling back to the full format when
the spill cap overflows. rev scores are intentionally zero (no downstream
consumer; see pack_outputs_compact docstring)."""
import numpy as np
import pytest

from nimble_tpu import seq as seqmod
from nimble_tpu.align.engine import AlignEngine, CompactOverflow
from nimble_tpu.config import Config, Data
from nimble_tpu.index.builder import build_index
from nimble_tpu.io.packing import pack_batch

EMIT_KEYS = ("bits", "score", "r1_fwd", "r2_fwd", "pass_")


@pytest.fixture(scope="module")
def workload():
    rng = np.random.default_rng(3)
    data = Data()
    seqs = []
    # >64 features so W >= 3 words exercises multi-word dictionary rows
    for i in range(70):
        s = rng.integers(0, 4, size=240).astype(np.int8)
        seqs.append(s)
        data.columns[0].append("lib")
        data.columns[1].append(f"f{i}")
        data.columns[2].append("240")
        data.columns[3].append(seqmod.decode(s))
    config = Config()
    index = build_index(data, config, k=21)
    B, L = 256, 96
    codes = rng.integers(0, 4, size=(B, L)).astype(np.int8)
    for i in range(0, B, 4):
        src = seqs[i % len(seqs)]
        st = int(rng.integers(0, len(src) - 90))
        codes[i, :90] = src[st : st + 90]
    codes[rng.random(codes.shape) < 0.01] = 4
    lens = rng.integers(40, L + 1, size=B).astype(np.int32)
    return index, config, codes, lens, L


def _outs(index, config, codes, lens, L, **kw):
    eng = AlignEngine(
        index, config, chunk_size=64, max_len=L, scan_chunks=2, **kw
    )
    pb = pack_batch({"r1_codes": codes, "r1_lens": lens}, L)
    return eng, eng.collect_async(eng.align_packed_async(pb))


def test_compact_matches_full(workload):
    index, config, codes, lens, L = workload
    _, full = _outs(index, config, codes, lens, L, compact_out=False)
    eng, got = _outs(index, config, codes, lens, L, compact_out=True)
    assert eng.compact_out, "compact must be active for this config"
    for k in EMIT_KEYS:
        assert np.array_equal(full[k], got[k]), k
    assert not got["r1_rev"].any() and not got["r2_rev"].any()


def test_compact_tiny_dict_spills(workload):
    """H=2 forces nearly every distinct bitset to collide -> spill path."""
    index, config, codes, lens, L = workload
    _, full = _outs(index, config, codes, lens, L, compact_out=False)
    eng, got = _outs(
        index, config, codes, lens, L,
        compact_out=True, compact_slots=2, compact_spill=64,
    )
    assert eng.compact_out, "compact must be active: spill path untested otherwise"
    for k in EMIT_KEYS:
        assert np.array_equal(full[k], got[k]), k


def test_compact_overflow_falls_back_full(workload):
    """Spill cap 1 overflows -> collect reruns the span full-format; the
    fallback ships real rev scores, so every key matches the codes path."""
    index, config, codes, lens, L = workload
    _, full = _outs(index, config, codes, lens, L, compact_out=False)
    eng, got = _outs(
        index, config, codes, lens, L,
        compact_out=True, compact_slots=2, compact_spill=1,
    )
    assert eng.compact_out, "compact must be active: fallback path untested otherwise"
    for k in full:
        assert np.array_equal(full[k], got[k]), k


def test_compact_unpack_overflow_raises():
    from nimble_tpu.align.engine import unpack_outputs_compact, compact_chunk_len

    C, W, H, SP = 8, 2, 4, 2
    flat = np.zeros(compact_chunk_len(C, W, H, SP), np.int32)
    flat[-8] = SP + 1
    with pytest.raises(CompactOverflow):
        unpack_outputs_compact(flat, C, H, SP, C)
