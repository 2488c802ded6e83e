"""Individual-axis (2-D mesh) kinship sharding through the production
CLI (SURVEY §5.7): K stays row-sharded over the "ind" axis during
accumulation and the written output matches the replicated path.
"""

import gzip
import os

import numpy as np
import pytest

import gemma_tpu.run as run_mod
from gemma_tpu.cli import parse_args
from gemma_tpu.run import batch_run


def _synth(tmp_path, n=30, p=97, seed=0, missing=0.05):
    rng = np.random.default_rng(seed)
    X = rng.binomial(2, rng.uniform(0.1, 0.5, (p, 1)), (p, n)).astype(float)
    X[rng.random((p, n)) < missing] = np.nan
    geno = str(tmp_path / "g.txt.gz")
    with gzip.open(geno, "wt") as fh:
        for j in range(p):
            vals = [("NA" if np.isnan(v) else f"{v:g}") for v in X[j]]
            fh.write(f"rs{j}, A, T, " + ", ".join(vals) + "\n")
    pheno = str(tmp_path / "p.txt")
    with open(pheno, "w") as fh:
        fh.writelines(f"{v:.6f}\n" for v in rng.normal(size=n))
    return geno, pheno


@pytest.fixture
def _mesh_env():
    """Set/clear GEMMA_TPU_MESH around a test."""
    def set_(spec):
        os.environ["GEMMA_TPU_MESH"] = spec
    yield set_
    os.environ.pop("GEMMA_TPU_MESH", None)


def test_gk_2d_cli_equality_and_shard_shapes(tmp_path, _mesh_env):
    """batch_run -gk on a snp=2 × ind=4 mesh: (a) K accumulates in
    (n_pad/4, n_pad) shards (never whole on one device), (b) the
    written cXX matches the replicated 1-D path, (c) -lmm from the
    2-D K matches -lmm from the replicated K.  n=30 does not divide
    the ind axis — exercises the padding path."""
    geno, pheno = _synth(tmp_path)
    out = str(tmp_path)

    base = f"-g {geno} -p {pheno} -outdir {out} -precision float64"
    batch_run(parse_args(f"{base} -gk -o ref".split()))
    assert not run_mod._LAST_GK_2D  # replicated path used

    _mesh_env("snp=2,ind=4")
    batch_run(parse_args(f"{base} -gk -o m2d".split()))
    info = dict(run_mod._LAST_GK_2D)
    assert info["sharded"] is True
    assert info["mesh_shape"] == {"snp": 2, "ind": 4}
    assert info["n_pad"] == 32          # 30 padded up to ind axis
    assert info["shard_shape"] == (8, 32)

    K_ref = np.loadtxt(str(tmp_path / "ref.cXX.txt"))
    K_2d = np.loadtxt(str(tmp_path / "m2d.cXX.txt"))
    np.testing.assert_allclose(K_2d, K_ref, atol=1e-8)

    # association from each K agrees
    os.environ.pop("GEMMA_TPU_MESH", None)
    batch_run(parse_args(
        f"{base} -k {out}/ref.cXX.txt -lmm 1 -o aref".split()))
    batch_run(parse_args(
        f"{base} -k {out}/m2d.cXX.txt -lmm 1 -o a2d".split()))
    with open(tmp_path / "aref.assoc.txt") as fh:
        ref_rows = fh.readlines()
    with open(tmp_path / "a2d.assoc.txt") as fh:
        got_rows = fh.readlines()
    assert len(ref_rows) == len(got_rows) > 1
    for r, g in zip(ref_rows[1:], got_rows[1:]):
        rv = np.array(r.split()[7:], dtype=float)
        gv = np.array(g.split()[7:], dtype=float)
        np.testing.assert_allclose(gv, rv, atol=1e-6)


def test_gk_2d_standardized_padded_n(tmp_path, _mesh_env):
    """-gk 2 with n NOT divisible by the ind axis: the variance
    formula must use the true n, not n_pad (ADVICE r3 high: pad
    columns counting into n_total/n_miss skewed every SNP's
    standardization by sqrt(n/n_pad))."""
    geno, pheno = _synth(tmp_path, n=30, p=64, seed=3)
    out = str(tmp_path)
    base = f"-g {geno} -p {pheno} -outdir {out} -precision float64"
    batch_run(parse_args(f"{base} -gk 2 -o ref".split()))
    _mesh_env("snp=2,ind=4")
    batch_run(parse_args(f"{base} -gk 2 -o m2d".split()))
    assert run_mod._LAST_GK_2D["n_pad"] == 32
    K_ref = np.loadtxt(str(tmp_path / "ref.sXX.txt"))
    K_2d = np.loadtxt(str(tmp_path / "m2d.sXX.txt"))
    np.testing.assert_allclose(K_2d, K_ref, atol=1e-8)


def test_gk_2d_standardized_and_exact_divide(tmp_path, _mesh_env):
    """-gk 2 (standardized) on a mesh where n divides the ind axis."""
    geno, pheno = _synth(tmp_path, n=32, p=64, seed=1)
    out = str(tmp_path)
    base = f"-g {geno} -p {pheno} -outdir {out} -precision float64"
    batch_run(parse_args(f"{base} -gk 2 -o ref".split()))
    _mesh_env("snp=1,ind=8")
    batch_run(parse_args(f"{base} -gk 2 -o m2d".split()))
    assert run_mod._LAST_GK_2D["shard_shape"] == (4, 32)
    K_ref = np.loadtxt(str(tmp_path / "ref.sXX.txt"))
    K_2d = np.loadtxt(str(tmp_path / "m2d.sXX.txt"))
    np.testing.assert_allclose(K_2d, K_ref, atol=1e-8)
