"""Distributed counting tests on the 8-device CPU mesh: the cb-bucket
all-to-all + per-shard device pipeline must reproduce the exact host
pipeline's counts regardless of which shard read which rows."""
import numpy as np
import pytest

from nimble_tpu.parallel.dist import cb_bucket_all_to_all, distributed_report, hash64
from nimble_tpu.parallel.mesh import make_mesh
from nimble_tpu.quant.exact import report_rows


def to_bits(features, vocab):
    W = max(1, -(-len(vocab) // 32))
    out = np.zeros(W, dtype=np.int32)
    for f in features.split(","):
        i = vocab.index(f)
        out[i // 32] |= np.int32(1) << np.int32(i % 32)
    return out


def test_hash64_stable():
    a = hash64("AAACCTGA")
    b = hash64("AAACCTGA")
    c = hash64("AAACCTGT")
    assert a == b != c


def test_bucket_exchange_roundtrip():
    plan = make_mesh(n_data=4, n_feature=1)
    n_shards, blk, width = 4, 3, 2
    rows = np.arange(n_shards * n_shards * blk * width, dtype=np.int32).reshape(
        n_shards, n_shards * blk, width
    )
    valid = np.ones((n_shards, n_shards * blk), dtype=bool)
    out_rows, out_valid = cb_bucket_all_to_all(plan.mesh, rows, valid)
    # shard s must now hold the s-th block from every source shard
    for s in range(n_shards):
        for src in range(n_shards):
            expected = rows[src, s * blk : (s + 1) * blk]
            got = out_rows[s, src * blk : (src + 1) * blk]
            assert np.array_equal(got, expected)
    assert out_valid.all()


def test_distributed_report_matches_exact():
    rng = np.random.default_rng(7)
    vocab = [f"g{i:02d}" for i in range(25)]
    rows = []
    for cell in range(12):
        for umi in range(10):
            for _ in range(int(rng.integers(1, 4))):
                k = int(rng.integers(1, 4))
                feats = sorted(rng.choice(25, size=k, replace=False))
                rows.append(
                    (
                        f"CELL{cell:02d}",
                        f"UMI{umi:02d}",
                        ",".join(vocab[f] for f in feats),
                        int(rng.integers(1, 60)),
                    )
                )
    expected, _ = report_rows(rows, 0.05)

    plan = make_mesh(n_data=8, n_feature=1)
    # scatter rows across shards arbitrarily (round-robin)
    shard_rows = [[] for _ in range(8)]
    for i, (cb, umi, feats, score) in enumerate(rows):
        shard_rows[i % 8].append((cb, umi, to_bits(feats, vocab), float(score)))

    got = distributed_report(plan.mesh, shard_rows, vocab, 0.05)
    assert got == expected


def test_distributed_report_skewed_barcode():
    """One cell barcode holding 50% of all rows (over-sequenced cell) must
    neither blow up the exchange buffer (pair-bucketing keeps blocks near
    the mean, not the hot-cb max) nor change the counts."""
    rng = np.random.default_rng(3)
    vocab = [f"g{i:02d}" for i in range(10)]
    rows = []
    # hot cell: 400 rows over 200 umis
    for umi in range(200):
        for _ in range(2):
            f = int(rng.integers(0, 10))
            rows.append(("HOTCELL", f"UMI{umi:03d}", vocab[f], 30))
    # 40 normal cells: 10 rows each
    for cell in range(40):
        for umi in range(10):
            f = int(rng.integers(0, 10))
            rows.append((f"CELL{cell:02d}", f"UMI{umi:03d}", vocab[f], 30))
    expected, _ = report_rows(rows, 0.05)

    n_shards = 8
    plan = make_mesh(n_data=n_shards, n_feature=1)
    shard_rows = [[] for _ in range(n_shards)]
    for i, (cb, umi, feats, score) in enumerate(rows):
        shard_rows[i % n_shards].append((cb, umi, to_bits(feats, vocab), float(score)))

    got, stats = distributed_report(plan.mesh, shard_rows, vocab, 0.05, with_stats=True)
    assert got == expected
    # cb-only bucketing would force blk >= hot-cb rows per source
    # (~400/8 = 50) -> buffer ~ n_shards^2 * 50 = 3200 rows for 800 actual.
    # Pair-bucketing keeps the padded buffer within 3x of the actual rows.
    assert stats["buffer_rows"] <= 3 * stats["rows"], stats


def test_hash_collision_salt_fallback(monkeypatch):
    """Force a collision in the salt-0 family; the report must silently move
    to a salted family instead of raising."""
    import nimble_tpu.parallel.dist as dist

    real = dist._hash_unique

    def colliding(strings, salt):
        h = real(strings, salt)
        if salt == 0 and len(strings) >= 2:
            h[1] = h[0]  # manufacture a collision
        return h

    monkeypatch.setattr(dist, "_hash_unique", colliding)
    plan = make_mesh(n_data=4, n_feature=1)
    vocab = ["A", "B"]
    shard_rows = [
        [("c1", "U1", to_bits("A", vocab), 30.0)],
        [("c2", "U2", to_bits("B", vocab), 30.0)],
        [],
        [],
    ]
    got = distributed_report(plan.mesh, shard_rows, vocab, 0.05)
    assert got == [("A", 1, "c1"), ("B", 1, "c2")]


def test_distributed_report_empty_shards():
    plan = make_mesh(n_data=4, n_feature=1)
    vocab = ["A", "B"]
    shard_rows = [[], [("c1", "U1", to_bits("A", vocab), 30.0)], [], []]
    got = distributed_report(plan.mesh, shard_rows, vocab, 0.05)
    assert got == [("A", 1, "c1")]
