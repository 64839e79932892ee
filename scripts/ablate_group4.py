"""Subtraction-based dissection of the group-probe path at several g:
window stage only, +probe/select, full step — plus chunk-size scaling to
separate fixed per-call overhead from device time."""
import sys, time
sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
import bench as B
from nimble_tpu.align import engine as E
from nimble_tpu.align.engine import AlignEngine
from nimble_tpu.index.builder import _attach_group_entries
from nimble_tpu.config import Data
from nimble_tpu import seq as seqmod

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

index, config, codes, lens = B.build_workload()
rng = np.random.default_rng(0)
backbone = rng.integers(0, 4, size=B.ALLELE_LEN).astype(np.int8)
data = Data()
for i in range(B.N_ALLELES):
    s = backbone.copy()
    pos = rng.integers(0, B.ALLELE_LEN, size=30)
    s[pos] = rng.integers(0, 4, size=30).astype(np.int8)
    data.columns[0].append("hla"); data.columns[1].append(f"allele{i:03d}")
    data.columns[2].append(str(B.ALLELE_LEN)); data.columns[3].append(seqmod.decode(s))


def timeit(f, *a, reps=10, burst=4):
    r = f(*a); jax.block_until_ready(r)
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        acc = None
        for _ in range(burst):
            s = f(*a); acc = s if acc is None else acc + s
        _ = int(acc)
        best = min(best, time.time() - t0)
    return best / burst * 1000


CH = B.CHUNK
c_dev = jax.device_put(codes[:CH]); l_dev = jax.device_put(lens[:CH])

for g in (2, 6):
    idx = _attach_group_entries(index, data, g=g)
    e = AlignEngine(idx, config, chunk_size=CH, max_len=B.READ_LEN, group_probe=True)
    p = e.params
    tables = e.tables
    kg = p.k + g - 1
    nb = tables["group_bucket"].shape[0]
    W = tables["class_bits"].shape[1]
    PP = B.READ_LEN - kg + 1

    from nimble_tpu.align.kernels import kmer_keys_pallas

    @jax.jit
    def win_only(c, l):
        hi_i, lo_i, h1, _h2, fwd_c, _p, valid = kmer_keys_pallas(c, l, kg, nb)
        return jnp.sum(hi_i) + jnp.sum(h1) + jnp.sum(valid)

    @jax.jit
    def win_probe(c, l):
        hi_i, lo_i, h1, _h2, fwd_c, _pal, valid = kmer_keys_pallas(c, l, kg, nb)
        jstar = jnp.clip(l - kg, 0, PP - 1)
        onehot = jnp.arange(PP, dtype=jnp.int32)[None, :] == jstar[:, None]
        cat = []
        for a in (hi_i, lo_i, h1, fwd_c, valid):
            t = jnp.where(onehot, a.astype(jnp.int32), 0).sum(axis=1, keepdims=True)
            cat.append(jnp.concatenate([a[:, ::g], t.astype(a.dtype)], axis=1))
        and_f, mask_f, and_r, mask_r = E.group_probe(*cat, tables, W, g)
        return jnp.sum(and_f) + jnp.sum(mask_f) + jnp.sum(and_r) + jnp.sum(mask_r)

    @jax.jit
    def full(c, l):
        return jnp.sum(E._score_mate_group(c, l, tables, p)[1])

    # raw gather at this geometry for reference
    Q = (PP + g - 1) // g + 1
    hq = jax.device_put(rng.integers(0, nb, size=(CH, Q)).astype(np.int32))
    gt = tables["group_bucket"]

    @jax.jit
    def raw_gather(h):
        return jnp.sum(gt[h], dtype=jnp.int32)

    print(f"g={g}: raw gather ({CH}x{Q} rows x{gt.shape[1]}w): {timeit(raw_gather, hq):.2f} ms", flush=True)
    print(f"g={g}: window stage only: {timeit(win_only, c_dev, l_dev):.2f} ms", flush=True)
    print(f"g={g}: window+tail+probe: {timeit(win_probe, c_dev, l_dev):.2f} ms", flush=True)
    print(f"g={g}: full step: {timeit(full, c_dev, l_dev):.2f} ms", flush=True)

# chunk scaling (fixed per-call overhead check): the dissection above shows
# a ~5.5ms floor (window-only == tiny-gather == ~5.5ms) that dwarfs device
# work at 8192 reads/call
for g in (2, 6):
    idxg = _attach_group_entries(index, data, g=g)
    for CH2 in (8192, 32768, 65536):
        e = AlignEngine(idxg, config, chunk_size=CH2, max_len=B.READ_LEN, group_probe=True)
        c2 = np.tile(codes, (max(1, CH2 // codes.shape[0] + 1), 1))[:CH2]
        l2 = np.full(CH2, B.READ_LEN, dtype=np.int32)
        cd = jax.device_put(c2); ld = jax.device_put(l2)

        def step(c, l):
            return jnp.sum(e._fn(e.tables, c, l)["score"])

        dt = timeit(step, cd, ld, reps=8)
        print(f"g={g} chunk {CH2}: {dt:.2f} ms/call = {CH2/dt*1000/1e6:.2f} M reads/s", flush=True)
