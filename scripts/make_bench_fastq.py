"""Generate the end-to-end CLI benchmark inputs: the bench.py HLA-100
workload (100 x 3kb alleles sharing a backbone, 100bp reads with 1%
substitution error, half reverse-complemented) as a library JSON + a
gzipped FASTQ, so `align` can be timed wall-clock on the same reads the
device benchmark uses.

Usage: python scripts/make_bench_fastq.py OUTDIR [N_READS]
"""
import gzip
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, pathlib.Path(__file__).resolve().parents[1].as_posix())

N_ALLELES = 100
ALLELE_LEN = 3000
READ_LEN = 100
ERROR_RATE = 0.01


def main():
    outdir = pathlib.Path(sys.argv[1])
    n_reads = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000_000
    outdir.mkdir(parents=True, exist_ok=True)

    from nimble_tpu import seq as seqmod
    from nimble_tpu.config import Config, Data

    rng = np.random.default_rng(0)
    backbone = rng.integers(0, 4, size=ALLELE_LEN).astype(np.int8)
    alleles = []
    data = Data()
    for i in range(N_ALLELES):
        s = backbone.copy()
        pos = rng.integers(0, ALLELE_LEN, size=30)
        s[pos] = rng.integers(0, 4, size=30).astype(np.int8)
        alleles.append(s)
        data.columns[0].append("hla bench")
        data.columns[1].append(f"allele{i:03d}")
        data.columns[2].append(str(ALLELE_LEN))
        data.columns[3].append(seqmod.decode(s))
    config = Config()
    lib_path = outdir / "hla100.json"
    with open(lib_path, "w") as f:
        json.dump([config.to_dict(), data.__dict__], f)
    print(f"library: {lib_path}")

    allele_mat = np.stack(alleles)
    fq_path = outdir / f"reads_{n_reads}.fastq.gz"
    base_lut = np.frombuffer(b"ACGT", dtype=np.uint8)
    qual = b"I" * READ_LEN
    chunk = 1 << 17
    with gzip.open(fq_path, "wb", compresslevel=1) as f:
        written = 0
        while written < n_reads:
            n = min(chunk, n_reads - written)
            src = rng.integers(0, N_ALLELES, size=n)
            st = rng.integers(0, ALLELE_LEN - READ_LEN + 1, size=n)
            idx = st[:, None] + np.arange(READ_LEN)[None, :]
            codes = allele_mat[src[:, None], idx]
            err = rng.random((n, READ_LEN)) < ERROR_RATE
            codes = np.where(
                err, rng.integers(0, 4, size=codes.shape), codes
            ).astype(np.int8)
            rc = rng.random(n) < 0.5
            codes[rc] = seqmod.revcomp_codes(codes[rc])
            chars = base_lut[codes]
            lines = []
            for i in range(n):
                lines.append(
                    b"@r%d\n%s\n+\n%s\n"
                    % (written + i, chars[i].tobytes(), qual)
                )
            f.write(b"".join(lines))
            written += n
            if written % (1 << 20) < chunk:
                print(f"  {written}/{n_reads}", flush=True)
    print(f"reads: {fq_path}")


if __name__ == "__main__":
    main()
