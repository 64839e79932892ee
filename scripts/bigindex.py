"""Large-library hardware run (VERDICT round 1, item 4): a 20k-allele
HLA/KIR-shaped library (20 gene families x 1000 alleles, 3kb, ~25 SNPs per
allele) driven through the wide-W engine path (W=625 words, two-choice probe
+ fori-loop class intersection) on the real chip. Records index build time,
table footprints, and reads/s."""
import sys, time
sys.path.insert(0, ".")
import numpy as np

N_FAMILIES = 20
ALLELES_PER_FAMILY = 1000
ALLELE_LEN = 3000
SNPS = 25
READ_LEN = 100
K = 21


def build_library():
    from nimble_tpu import seq as seqmod
    from nimble_tpu.config import Data

    rng = np.random.default_rng(0)
    data = Data()
    backbones = []
    for fam in range(N_FAMILIES):
        bb = rng.integers(0, 4, size=ALLELE_LEN).astype(np.int8)
        backbones.append(bb)
        for a in range(ALLELES_PER_FAMILY):
            s = bb.copy()
            pos = rng.integers(0, ALLELE_LEN, size=SNPS)
            s[pos] = rng.integers(0, 4, size=SNPS).astype(np.int8)
            data.columns[0].append("hla_kir_20k")
            data.columns[1].append(f"F{fam:02d}*{a:04d}")
            data.columns[2].append(str(ALLELE_LEN))
            data.columns[3].append(seqmod.decode(s))
    return data, backbones


def main():
    import jax, jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from nimble_tpu.config import Config
    from nimble_tpu.index.builder import build_index
    from nimble_tpu.align.engine import AlignEngine
    from nimble_tpu.parallel.mesh import plan_index_placement

    print("building 20k-allele library...", file=sys.stderr, flush=True)
    t0 = time.time()
    data, backbones = build_library()
    print(f"library built in {time.time()-t0:.1f}s", file=sys.stderr, flush=True)

    config = Config()
    t0 = time.time()
    import pathlib
    from nimble_tpu.index.builder import KmerIndex

    cache = pathlib.Path(".bench_data/big20k.idx.npz")
    if cache.exists():
        index = KmerIndex.load(str(cache))
    else:
        index = build_index(data, config, k=K)
        cache.parent.mkdir(exist_ok=True)
        index.save(str(cache))
    t_build = time.time() - t0
    table_bytes = (index.table_hi.nbytes + index.table_lo.nbytes
                   + index.table_vsame.nbytes + index.table_vdiff.nbytes)
    print(
        f"index: {index.n_kmers} kmers, {index.n_classes} classes, "
        f"{index.n_features} features, W={index.bitset_words}, "
        f"{index.n_buckets} buckets, built in {t_build:.1f}s; "
        f"table {table_bytes/1e9:.2f} GB, class_bits "
        f"{index.class_bits.nbytes/1e9:.2f} GB",
        file=sys.stderr, flush=True,
    )
    print(plan_index_placement(index, n_chips=8), file=sys.stderr, flush=True)

    # reads sampled across families, 1% error, half reverse-complemented
    from nimble_tpu import seq as seqmod

    rng = np.random.default_rng(7)
    n_reads = 1 << 15
    codes = np.empty((n_reads, READ_LEN), dtype=np.int8)
    for i in range(n_reads):
        bb = backbones[i % N_FAMILIES]
        st = rng.integers(0, ALLELE_LEN - READ_LEN + 1)
        codes[i] = bb[st : st + READ_LEN]
    err = rng.random((n_reads, READ_LEN)) < 0.01
    codes = np.where(err, rng.integers(0, 4, size=codes.shape), codes).astype(np.int8)
    rc = np.random.default_rng(1).random(n_reads) < 0.5
    codes[rc] = seqmod.revcomp_codes(codes[rc])
    lens = np.full(n_reads, READ_LEN, dtype=np.int32)

    t0 = time.time()
    chunk_arg = int(sys.argv[1]) if len(sys.argv) > 1 else None
    engine = AlignEngine(index, config, chunk_size=chunk_arg, max_len=READ_LEN)
    chunk = engine.chunk_size
    path = next(
        (k for k in ("group_bucket", "gband_bucket", "groupcls_bucket",
                     "mono_bucket", "mcls_bucket") if k in engine.tables),
        "two-choice",
    )
    print(f"engine path: {path} inline={'stash_vs_bits' in engine.tables} "
          f"banded_runs={'class_bandrow' in engine.tables} chunk={chunk} "
          f"(tables to device in {time.time()-t0:.1f}s)",
          file=sys.stderr, flush=True)

    if codes.shape[0] < chunk:
        reps = -(-chunk // codes.shape[0])
        codes = np.tile(codes, (reps, 1))[:chunk]
        lens = np.tile(lens, reps)[:chunk]
    c_dev = jax.device_put(codes[:chunk])
    l_dev = jax.device_put(lens[:chunk])

    t0 = time.time()
    r = engine._fn(engine.tables, c_dev, l_dev)
    jax.block_until_ready(r)
    pass_rate = float(np.asarray(jnp.reshape(r["pass_"], (-1,))).mean())
    print(f"compile+first chunk: {time.time()-t0:.1f}s; pass {pass_rate:.3f}",
          file=sys.stderr, flush=True)

    # Measurement method: every separate device operation through the
    # relay (an add, a reduce, a transfer) is its own Execute with a ~6 ms
    # fixed cost, so the old 4-call burst with device-side accumulation
    # double-counted ~6 ms/chunk of relay overhead. Chain instead: each
    # call reduces its own outputs to one scalar and adds the previous
    # call's scalar, forcing sequential execution with ONE final transfer.
    # The TPU is multi-tenant with >4x drift across minutes: best across
    # several epochs spaced ~20 s apart (speed-of-light, as bench.py).
    p_eng = engine.params
    from nimble_tpu.align.engine import align_step as _astep

    fn_sum = jax.jit(
        lambda t, c, l, eps: jnp.sum(_astep(t, p_eng, c, l)["score"]) + eps
    )
    eps0 = jax.device_put(jnp.int32(0))
    r = fn_sum(engine.tables, c_dev, l_dev, eps0)
    _ = int(r)
    N = 16
    best = 1e9
    for epoch in range(5):
        for _ in range(3):
            t0 = time.time()
            eps = eps0
            for _ in range(N):
                eps = fn_sum(engine.tables, c_dev, l_dev, eps)
            _ = int(eps)
            best = min(best, (time.time() - t0) / N)
        print(f"  epoch {epoch}: best {best*1000:.2f} ms/chunk", flush=True)
        if epoch < 4:
            time.sleep(20)
    rate = chunk / best
    print(f"20k-allele wide-W path: {best*1000:.2f} ms/chunk({chunk}) = "
          f"{rate/1e6:.3f} M reads/s/chip", flush=True)

    # the CLI operating point: scanned multi-chunk span dispatch (one
    # Execute call runs scan_chunks chunks, amortizing the ~6 ms fixed
    # relay cost the single-call number above pays per chunk)
    S = engine.scan_chunks
    if S > 1 and engine._scan_fn is not None:
        span = S * chunk
        reps = -(-span // codes.shape[0])
        c_sp = np.tile(codes, (reps, 1))[:span].reshape(S, chunk, -1)
        l_sp = np.tile(lens, reps)[:span].reshape(S, chunk)
        cs_dev = jax.device_put(c_sp)
        ls_dev = jax.device_put(l_sp)

        def scan_sum(t, cs, ls, eps):
            r = engine._scan_fn(t, cs, ls)
            return jnp.sum(r & 0x7FFF) + eps

        fscan = jax.jit(scan_sum)
        epz = jax.device_put(jnp.int32(0))
        t0 = time.time()
        _ = int(fscan(engine.tables, cs_dev, ls_dev, epz))
        print(f"scan compile+first span: {time.time()-t0:.1f}s",
              file=sys.stderr, flush=True)
        best_s = 1e9
        for epoch in range(5):
            for _ in range(3):
                t0 = time.time()
                eps = epz
                for _ in range(4):
                    eps = fscan(engine.tables, cs_dev, ls_dev, eps)
                _ = int(eps)
                best_s = min(best_s, (time.time() - t0) / 4)
            print(f"  scan epoch {epoch}: best {best_s/S*1000:.2f} ms/chunk",
                  flush=True)
            if epoch < 4:
                time.sleep(20)
        print(f"20k-allele scan dispatch: {best_s/S*1000:.2f} ms/chunk = "
              f"{span/best_s/1e6:.3f} M reads/s/chip", flush=True)


if __name__ == "__main__":
    main()
