"""A/B the default group probe (g=6) against the mono per-k-mer path on
errored reads: per-read match/score deltas and count-matrix deltas through
`report` (VERDICT r2 item 4). Runs on any backend (CPU mesh is fine —
accuracy, not throughput).

Usage: python scripts/ab_group_accuracy.py [N_READS] [ERR1,ERR2,...]
"""
import os
import pathlib
import sys
import tempfile

import numpy as np

sys.path.insert(0, pathlib.Path(__file__).resolve().parents[1].as_posix())

N_ALLELES = 100
ALLELE_LEN = 3000
READ_LEN = 100
K = 21


def build(n_reads, err):
    from nimble_tpu import seq as seqmod
    from nimble_tpu.config import Config, Data
    from nimble_tpu.index.builder import build_index

    rng = np.random.default_rng(0)
    backbone = rng.integers(0, 4, size=ALLELE_LEN).astype(np.int8)
    alleles = []
    data = Data()
    for i in range(N_ALLELES):
        s = backbone.copy()
        s[rng.integers(0, ALLELE_LEN, size=30)] = rng.integers(
            0, 4, size=30
        ).astype(np.int8)
        alleles.append(s)
        data.columns[0].append("ab")
        data.columns[1].append(f"allele{i:03d}")
        data.columns[2].append(str(ALLELE_LEN))
        data.columns[3].append(seqmod.decode(s))
    config = Config()
    index = build_index(data, config, k=K)

    amat = np.stack(alleles)
    src = rng.integers(0, N_ALLELES, size=n_reads)
    st = rng.integers(0, ALLELE_LEN - READ_LEN + 1, size=n_reads)
    codes = amat[src[:, None], st[:, None] + np.arange(READ_LEN)[None, :]]
    emask = rng.random((n_reads, READ_LEN)) < err
    codes = np.where(
        emask, rng.integers(0, 4, size=codes.shape), codes
    ).astype(np.int8)
    rc = rng.random(n_reads) < 0.5
    codes[rc] = seqmod.revcomp_codes(codes[rc])
    lens = np.full(n_reads, READ_LEN, dtype=np.int32)
    return index, config, codes, lens, src


def run_engine(index, config, codes, lens, mono):
    from nimble_tpu.align.engine import AlignEngine

    os.environ["NIMBLE_TPU_NO_GROUP_PROBE"] = "1" if mono else ""
    eng = AlignEngine(index, config, chunk_size=4096, max_len=READ_LEN)
    assert (eng.params.group_g > 0) != mono, (
        f"mode not in effect: mono={mono} group_g={eng.params.group_g}"
    )
    outs = []
    for s in range(0, codes.shape[0], 4096 * 4):
        e = min(s + 4096 * 4, codes.shape[0])
        outs.append(eng.align_batch(codes[s:e], lens[s:e]))
    return {k: np.concatenate([o[k] for o in outs]) for k in outs[0]}


def count_matrix(index, out, src):
    """Pseudo count matrix: per true-source allele, how many reads report a
    feature set containing the source (proxy for downstream counts)."""
    from nimble_tpu.align.pipeline import decode_bitsets

    member = decode_bitsets(out["bits"], index.n_features)
    ok = member[np.arange(len(src)), src] & out["pass_"]
    return ok


def main():
    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    errs = (
        [float(x) for x in sys.argv[2].split(",")]
        if len(sys.argv) > 2
        else [0.005, 0.01, 0.02]
    )
    from nimble_tpu.quant.exact import report_rows
    from nimble_tpu.align.pipeline import resolve_features, EmitConfig

    emit = EmitConfig(False, False, 0, 10)
    print(f"{'err':>5} {'pass_mono':>9} {'pass_g6':>8} {'agree':>7} "
          f"{'g_only':>7} {'m_only':>7} {'score_eq':>8} {'src_mono':>8} "
          f"{'src_g6':>7} {'cnt_delta':>9}")
    for err in errs:
        index, config, codes, lens, src = build(n_reads, err)
        out_m = run_engine(index, config, codes, lens, mono=True)
        out_g = run_engine(index, config, codes, lens, mono=False)
        pm, pg = out_m["pass_"], out_g["pass_"]
        agree = (pm == pg).mean()
        both = pm & pg
        score_eq = (out_m["score"][both] == out_g["score"][both]).mean()
        src_m = count_matrix(index, out_m, src)
        src_g = count_matrix(index, out_g, src)

        # count-matrix delta through the exact report pipeline: one synthetic
        # cell, UMI per read (bulk-style proxy), features from each path
        def counts(out):
            feats, keep = resolve_features(index, out["bits"], emit)
            rows = [
                ("cell0", f"umi{i:07d}", feats[i], float(out["score"][i]))
                for i in range(len(feats))
                if keep[i] and out["pass_"][i]
            ]
            c, _ = report_rows(rows, 0.05)
            return {(f, cb): n for f, n, cb in c}

        cm, cg = counts(out_m), counts(out_g)
        keys = set(cm) | set(cg)
        delta = sum(abs(cm.get(k, 0) - cg.get(k, 0)) for k in keys)
        total = sum(cm.values())
        print(
            f"{err:5.3f} {pm.mean():9.4f} {pg.mean():8.4f} {agree:7.4f} "
            f"{(pg & ~pm).mean():7.4f} {(pm & ~pg).mean():7.4f} "
            f"{score_eq:8.4f} {src_m.mean():8.4f} {src_g.mean():7.4f} "
            f"{delta/total:9.5f}"
        )


if __name__ == "__main__":
    main()
