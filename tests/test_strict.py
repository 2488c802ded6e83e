"""Sanitizer-parity checks: -strict escalates validate_K warnings to
hard stops (debug.h:144-191); without it the run warns and continues
(debug.cpp:358-381)."""

import numpy as np
import pytest

from gemma_tpu.cli import parse_args
from gemma_tpu.run import batch_run


def _tiny_dataset(tmp_path, K):
    n = K.shape[0]
    rng = np.random.default_rng(3)
    geno = tmp_path / "geno.txt"
    with open(geno, "w") as fh:
        for i in range(24):
            row = rng.binomial(2, 0.4, n)
            fh.write(f"rs{i}, A, T, " + ", ".join(map(str, row)) + "\n")
    pheno = tmp_path / "pheno.txt"
    pheno.write_text("".join(f"{v:.4f}\n" for v in rng.normal(size=n)))
    kfile = tmp_path / "K.txt"
    np.savetxt(kfile, K, fmt="%.10f", delimiter="\t")
    return geno, pheno, kfile


def test_strict_escalates_on_ill_conditioned_K(tmp_path):
    n = 20
    rng = np.random.default_rng(0)
    A = rng.normal(size=(n, 4))
    # rank-4 PSD matrix: many ~zero eigenvalues + condition >> 2e6
    K = A @ np.diag([1e8, 1.0, 1.0, 1e-5]) @ A.T
    K = (K + K.T) / 2
    geno, pheno, kfile = _tiny_dataset(tmp_path, K)

    common = (f"-g {geno} -p {pheno} -k {kfile} -lmm 1 -maf 0 -miss 1 "
              f"-outdir {tmp_path} -precision float64")

    # default: warnings only, the run completes
    with pytest.warns(UserWarning):
        batch_run(parse_args((common + " -o ok").split()))
    assert (tmp_path / "ok.assoc.txt").exists()

    # -strict: the same warnings become a hard stop
    with pytest.raises(FloatingPointError):
        batch_run(parse_args((common + " -strict -o bad").split()))


def test_check_rejects_nonfinite_kinship(tmp_path):
    n = 12
    K = np.eye(n)
    K[3, 5] = K[5, 3] = np.nan
    geno, pheno, kfile = _tiny_dataset(tmp_path, K)
    common = (f"-g {geno} -p {pheno} -k {kfile} -lmm 1 -maf 0 -miss 1 "
              f"-outdir {tmp_path}")
    with pytest.raises(FloatingPointError):
        batch_run(parse_args((common + " -o x").split()))
    # -no-check skips the guard (the eigensolver then sees the NaN,
    # mirroring GEMMA's -no-check contract); just assert it parses
    cfg = parse_args((common + " -no-check -o y").split())
    assert cfg.check is False


def test_strict_flag_parses():
    cfg = parse_args("-g g -p p -lmm 1".split().__class__(
        ["-gk", "-strict", "-no-fpe-check", "-legacy"]))
    assert cfg.strict and not cfg.fpe_check and cfg.legacy
