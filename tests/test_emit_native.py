"""Native C++ TSV emission (io.native.format_rows) must be byte-identical
to the Python fallback loop across bulk and tag-carrying rows, including
negative positions and empty string fields."""
import io

import numpy as np
import pytest

from nimble_tpu.align import pipeline as P
from nimble_tpu.io import native


class FakeIndex:
    n_features = 100
    feature_names = np.array([f"allele{i:03d}" for i in range(100)])
    feature_to_group = np.arange(100)
    group_names = feature_names


def make_out(rng, n):
    classes = np.zeros((37, 4), dtype=np.int32)
    for i in range(37):
        classes[i, i % 4] = 1 << (i % 30)
    classes[0] = 0  # an unmapped class
    bits = classes[rng.integers(0, 37, size=n)]
    return {
        "pass_": rng.random(n) < 0.9,
        "bits": bits,
        "score": rng.integers(0, 201, size=n).astype(np.int32),
        "r1_fwd": rng.integers(0, 101, size=n).astype(np.int32),
        "r2_fwd": rng.integers(0, 101, size=n).astype(np.int32),
    }


def emit(out, batch, use_native, monkeypatch):
    if not use_native:
        monkeypatch.setattr(native, "available", lambda: False)
    r = P.LibraryRunner(
        None, FakeIndex, None, P.EmitConfig(False, False, 0, 10), "x"
    )
    r._file = io.BytesIO()
    k = r.emit_out(out, batch)
    monkeypatch.undo()
    return r._file.getvalue(), k


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_bulk_rows_byte_equal(monkeypatch):
    rng = np.random.default_rng(5)
    out = make_out(rng, 4096)
    got, k1 = emit(out, {}, True, monkeypatch)
    want, k2 = emit(out, {}, False, monkeypatch)
    assert k1 == k2 and got == want
    assert k1 > 0


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_tagged_rows_byte_equal(monkeypatch):
    rng = np.random.default_rng(6)
    n = 4096
    out = make_out(rng, n)
    batch = {
        "cbs": [f"CB{i % 97:014d}" if i % 5 else "" for i in range(n)],
        "umis": [f"U{i % 811:09d}" for i in range(n)],
        "gns": ["" if i % 3 else f"Gene{i % 50}" for i in range(n)],
        # include -1 positions (unmapped-mate convention)
        "poss": [(i % 1000, -1 if i % 7 == 0 else (i * 3) % 1000) for i in range(n)],
    }
    got, k1 = emit(out, batch, True, monkeypatch)
    want, k2 = emit(out, batch, False, monkeypatch)
    assert k1 == k2 and got == want


def test_unique_rows_matches_np_unique():
    rng = np.random.default_rng(7)
    bits = rng.integers(-5, 5, size=(5000, 6)).astype(np.int32)
    uniq, inv = P._unique_rows(bits)
    assert np.array_equal(uniq[inv], bits)
    ref_uniq = np.unique(bits, axis=0)
    got_sorted = uniq[np.lexsort(uniq.T[::-1])]
    assert np.array_equal(got_sorted, ref_uniq)


def test_unique_rows_collision_fallback(monkeypatch):
    # all-ones multipliers make distinct rows [1,2] and [2,1] hash equal;
    # the verification pass must detect it and fall back to the exact path
    bits = np.array([[1, 2], [2, 1], [1, 2]], dtype=np.int32)

    class FakeRng:
        def integers(self, *a, **k):
            return np.zeros(2, dtype=np.int64)  # |1 -> all-ones multipliers

    monkeypatch.setattr(P.np.random, "default_rng", lambda *a: FakeRng())
    uniq, inv = P._unique_rows(bits)
    assert np.array_equal(uniq[inv], bits)
    assert uniq.shape[0] == 2
