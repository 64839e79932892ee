"""Multi-chip sharding tests on the virtual 8-device CPU mesh: sharded
results must match single-device results exactly."""
import numpy as np
import pytest

import jax

from nimble_tpu import seq as seqmod
from nimble_tpu.align.engine import AlignEngine
from nimble_tpu.config import Config, Data
from nimble_tpu.index.builder import build_index
from nimble_tpu.parallel.mesh import make_mesh


def build_workload(n_features=40, seed=3):
    rng = np.random.default_rng(seed)
    backbone = "".join("ACGT"[i] for i in rng.integers(0, 4, size=500))
    data = Data()
    for i in range(n_features):
        s = list(backbone)
        for pos in rng.integers(0, 500, size=10):
            s[pos] = "ACGT"[rng.integers(0, 4)]
        data.columns[0].append("lib")
        data.columns[1].append(f"f{i}")
        data.columns[2].append("500")
        data.columns[3].append("".join(s))
    cfg = Config(score_threshold=0, score_filter=0, score_percent=0.0)
    index = build_index(data, cfg, k=21)
    reads = []
    for i in range(64):
        src = data.sequences[i % n_features]
        start = int(rng.integers(0, 400))
        reads.append(src[start : start + 90])
    codes, lens = seqmod.encode_batch(reads, 90)
    return index, cfg, codes, lens


def test_eight_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("n_data,n_feature", [(8, 1), (4, 2), (2, 4)])
def test_sharded_matches_single_device(n_data, n_feature):
    index, cfg, codes, lens = build_workload()
    base = AlignEngine(index, cfg, chunk_size=64, max_len=90)
    ref = base.align_batch(codes, lens)

    plan = make_mesh(n_data=n_data, n_feature=n_feature)
    sharded = AlignEngine(index, cfg, chunk_size=64, max_len=90, mesh=plan)
    got = sharded.align_batch(codes, lens)

    assert np.array_equal(ref["score"], got["score"])
    assert np.array_equal(ref["pass_"], got["pass_"])
    W = ref["bits"].shape[1]
    assert np.array_equal(ref["bits"], got["bits"][:, :W])
    assert (got["bits"][:, W:] == 0).all()


def test_graft_entry_single():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out["score"].shape[0] == args[1].shape[0]
    assert (np.asarray(out["score"]) > 0).any()


def test_graft_entry_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_index_placement_planner():
    from nimble_tpu.parallel.mesh import plan_index_placement

    index, cfg, codes, lens = build_workload()
    # huge budget: everything replicated
    plan = plan_index_placement(index, hbm_bytes_per_chip=16 << 30, n_chips=8)
    assert plan["feature_shards"] == 1 and plan["fits"]
    # tiny budget: class bitsets must shard across the feature axis
    tiny = int((index.table_hi.nbytes * 4 + index.class_bits.nbytes / 2) / 0.6) + 1024
    plan = plan_index_placement(index, hbm_bytes_per_chip=tiny, n_chips=8)
    assert plan["feature_shards"] >= 2
