"""Paired-end (10x-shaped) benchmark inputs (VERDICT r4 item 2): R1 =
CB(16) + UMI(12) + cDNA, R2 = mate cDNA, both drawn from the HLA-100
bench library with 1% error — the read-pair shape the reference's
fastq-to-bam produces (reference: nimble/fastq_barcode_processor.py:
144-209). Writes r1/r2 FASTQs + a CB whitelist; drive with:
  python -m nimble_tpu fastq-to-bam --r1-fastq r1 --r2-fastq r2 \
      --map whitelist.txt --output tagged.bam -c 4
  python -m nimble_tpu align --reference hla100.json --output out.tsv \
      --input tagged.bam -c 4

Usage: python scripts/make_paired_bench.py OUTDIR [N_PAIRS]
"""
import gzip
import pathlib
import sys

import numpy as np

sys.path.insert(0, pathlib.Path(__file__).resolve().parents[1].as_posix())

N_ALLELES = 100
ALLELE_LEN = 3000
R1_CDNA = 72
R2_LEN = 100
CB_LEN = 16
UMI_LEN = 12
N_CELLS = 1000
ERROR_RATE = 0.01


def main():
    outdir = pathlib.Path(sys.argv[1])
    n_pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    outdir.mkdir(parents=True, exist_ok=True)

    from nimble_tpu import seq as seqmod

    # same library construction as make_bench_fastq.py (hla100.json)
    rng = np.random.default_rng(0)
    backbone = rng.integers(0, 4, size=ALLELE_LEN).astype(np.int8)
    alleles = []
    for i in range(N_ALLELES):
        s = backbone.copy()
        pos = rng.integers(0, ALLELE_LEN, size=30)
        s[pos] = rng.integers(0, 4, size=30).astype(np.int8)
        alleles.append(s)
    mat = np.stack(alleles)
    lut = np.frombuffer(b"ACGT", dtype=np.uint8)

    rng = np.random.default_rng(42)
    cells = lut[rng.integers(0, 4, size=(N_CELLS, CB_LEN))]
    with open(outdir / "whitelist.txt", "w") as f:
        for c in cells:
            f.write(c.tobytes().decode() + "\n")

    r1p = outdir / f"paired_r1_{n_pairs}.fastq.gz"
    r2p = outdir / f"paired_r2_{n_pairs}.fastq.gz"
    q1 = b"I" * (CB_LEN + UMI_LEN + R1_CDNA)
    q2 = b"I" * R2_LEN
    chunk = 1 << 16
    with gzip.open(r1p, "wb", compresslevel=1) as f1, gzip.open(
        r2p, "wb", compresslevel=1
    ) as f2:
        done = 0
        while done < n_pairs:
            n = min(chunk, n_pairs - done)
            src = rng.integers(0, N_ALLELES, size=n)
            st = rng.integers(0, ALLELE_LEN - (R1_CDNA + 120 + R2_LEN), size=n)
            i1 = st[:, None] + np.arange(R1_CDNA)[None, :]
            c1 = mat[src[:, None], i1].astype(np.int8)
            st2 = st + R1_CDNA + 120
            i2 = st2[:, None] + np.arange(R2_LEN)[None, :]
            c2 = seqmod.revcomp_codes(
                mat[src[:, None], i2].astype(np.int8)
            )
            for c in (c1, c2):
                err = rng.random(c.shape) < ERROR_RATE
                c[...] = np.where(
                    err, rng.integers(0, 4, size=c.shape), c
                ).astype(np.int8)
            cb = cells[rng.integers(0, N_CELLS, size=n)]
            umi = lut[rng.integers(0, 4, size=(n, UMI_LEN))]
            s1 = lut[c1]
            s2 = lut[c2]
            b1 = []
            b2 = []
            for i in range(n):
                name = b"p%d" % (done + i)
                b1.append(
                    b"@%s\n%s%s%s\n+\n%s\n"
                    % (name, cb[i].tobytes(), umi[i].tobytes(),
                       s1[i].tobytes(), q1)
                )
                b2.append(b"@%s\n%s\n+\n%s\n" % (name, s2[i].tobytes(), q2))
            f1.write(b"".join(b1))
            f2.write(b"".join(b2))
            done += n
            print(f"\r{done}/{n_pairs}", end="", file=sys.stderr, flush=True)
    print(f"\n{r1p}\n{r2p}", flush=True)


if __name__ == "__main__":
    main()
