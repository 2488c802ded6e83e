"""Synthetic biobank-scale dataset generator (BASELINE config 5).

Writes PLINK .bed/.bim/.fam (and optionally a BIMBAM text file) with
n individuals × p SNPs, HWE genotypes at random allele frequencies,
and a phenotype with chosen heritability — the conformance/perf
input the reference repo lacks at scale.

    python scripts/synth_biobank.py --n 100000 --p 500000 \
        --h2 0.5 --out /tmp/biobank

Generation is streamed in SNP blocks so memory stays bounded.
"""

from __future__ import annotations

import argparse

import numpy as np

_BED_MAGIC = bytes([0x6C, 0x1B, 0x01])
# dosage 0 → bits 11, 1 → 10, 2 → 00, (missing → 01)
_DOSAGE_TO_CODE = np.array([3, 2, 0], dtype=np.uint8)


def write_plink(out: str, n: int, p: int, h2: float, seed: int,
                block: int = 4096, maf_lo: float = 0.05,
                maf_hi: float = 0.5) -> None:
    rng = np.random.default_rng(seed)
    n_bytes = (n + 3) // 4
    pad = 4 * n_bytes - n

    g_sum = np.zeros(n)          # streaming genetic value
    var_g = 0.0

    with open(out + ".bed", "wb") as bed, open(out + ".bim", "w") as bim:
        bed.write(_BED_MAGIC)
        for s0 in range(0, p, block):
            k = min(block, p - s0)
            maf = rng.uniform(maf_lo, maf_hi, k)
            X = rng.binomial(2, maf[:, None], size=(k, n)).astype(np.int8)

            beta = rng.normal(0.0, 1.0, k)
            Xc = X - X.mean(axis=1, keepdims=True)
            sd = Xc.std(axis=1)
            sd[sd == 0] = 1.0
            g_sum += (beta / sd) @ Xc
            var_g += k

            codes = _DOSAGE_TO_CODE[X]
            if pad:
                codes = np.concatenate(
                    [codes, np.zeros((k, pad), np.uint8)], axis=1)
            codes = codes.reshape(k, n_bytes, 4)
            packed = (codes[:, :, 0] | (codes[:, :, 1] << 2)
                      | (codes[:, :, 2] << 4) | (codes[:, :, 3] << 6))
            bed.write(packed.astype(np.uint8).tobytes())

            for j in range(k):
                i = s0 + j
                bim.write(f"{i % 22 + 1}\trs{i}\t0\t{1000 * i}\tA\tT\n")

    g = g_sum / np.sqrt(var_g)
    g = g / g.std() * np.sqrt(h2)
    y = g + rng.normal(0.0, np.sqrt(1.0 - h2), n)

    with open(out + ".fam", "w") as fam:
        for i in range(n):
            fam.write(f"F{i}\tI{i}\t0\t0\t0\t{y[i]:.6f}\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10000)
    ap.add_argument("--p", type=int, default=50000)
    ap.add_argument("--h2", type=float, default=0.5)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", required=True)
    a = ap.parse_args()
    write_plink(a.out, a.n, a.p, a.h2, a.seed)
    print(f"wrote {a.out}.bed/.bim/.fam  (n={a.n}, p={a.p}, h2={a.h2})")


if __name__ == "__main__":
    main()
