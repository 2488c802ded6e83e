"""Memory-trueness of the n-axis scale-out (round-3 verdict #1) and
CLI coverage of the sharded -lmm eigen branch (#3).

The contract (SURVEY §5.7): when the 2-D (snp × ind) mesh is engaged,
no single device ever holds an n²-scale buffer — K accumulates
row-sharded, the eigendecomposition's intermediates stay row-sharded
(parallel/eigh.py's per-allocation pins), K streams host→device
shard-by-shard, U stays row-sharded through the rotations and the 2-D
association pipeline.  GEMMA_TPU_MEM_GUARD arms a live-array tripwire
(utils/memguard.py) checked at every pipeline step; the limit here is
set between the largest LEGITIMATE buffer (one n²/ind_axis shard, one
≤bucket² replicated leaf) and n²/2 — full staging or silent
replication trips it with the step's tag.
"""

import gzip
import os

import numpy as np
import pytest

import gemma_tpu.run as run_mod
from gemma_tpu.cli import parse_args
from gemma_tpu.run import batch_run

N, P = 512, 384


def _synth(tmp_path, n=N, p=P, seed=11, missing=0.04):
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
def _env(monkeypatch):
    """Arm the 2-D mesh, a small eigensolver bucket (so a replicated
    leaf is distinguishable from an n²-scale buffer at test size) and
    the allocation tripwire."""
    # one shard of K = N²/4 float32 bytes; anything ≥ N²/2 is a bug
    limit = int(1.2 * (N * N * 4 // 4))
    monkeypatch.setenv("GEMMA_TPU_MESH", "snp=2,ind=4")
    monkeypatch.setenv("GEMMA_TPU_EIGH_BUCKET", "128")
    monkeypatch.setenv("GEMMA_TPU_EIGH_MIN_BLOCK", "128")
    monkeypatch.setenv("GEMMA_TPU_MEM_GUARD", str(limit))
    yield


def test_memory_true_gk_lmm_2d(tmp_path, _env, monkeypatch):
    """batch_run -gk AND -lmm 1 (float32) on the snp=2 × ind=4 mesh
    with the allocation tripwire armed:

      * the run completes — no live single-device buffer ever exceeded
        ~1.2× one K shard (the old jnp.asarray(Kc) staging and the
        eager n×n Gaussian probe would both trip it);
      * the sharded eigen branch (run.py _load_or_compute_eigen →
        eigh_sharded) actually executed and left U row-sharded;
      * the association took the 2-D pipeline (U never all-gathered);
      * outputs match the replicated float32 path.
    """
    geno, pheno = _synth(tmp_path)
    out = str(tmp_path)
    base = f"-g {geno} -p {pheno} -outdir {out} -precision float32"

    # replicated float32 reference first (no mesh, no guard)
    monkeypatch.delenv("GEMMA_TPU_MESH")
    monkeypatch.delenv("GEMMA_TPU_MEM_GUARD")
    batch_run(parse_args(f"{base} -gk -o ref".split()))
    batch_run(parse_args(
        f"{base} -k {out}/ref.cXX.txt -lmm 1 -o aref".split()))
    assert not run_mod._LAST_EIGEN_SHARDED

    monkeypatch.setenv("GEMMA_TPU_MESH", "snp=2,ind=4")
    monkeypatch.setenv("GEMMA_TPU_MEM_GUARD",
                       str(int(1.2 * (N * N * 4 // 4))))
    batch_run(parse_args(f"{base} -gk -o m2d".split()))
    assert run_mod._LAST_GK_2D["sharded"] is True

    batch_run(parse_args(
        f"{base} -k {out}/m2d.cXX.txt -lmm 1 -o a2d".split()))

    info = dict(run_mod._LAST_EIGEN_SHARDED)
    assert info["n"] == N and info["min_block"] == 128
    assert info["u_sharded"] is True, info
    assert "ind" in info["u_spec"], info
    assert run_mod._LAST_ASSOC_2D["mesh_shape"] == {"snp": 2, "ind": 4}

    K_ref = np.loadtxt(f"{out}/ref.cXX.txt")
    K_2d = np.loadtxt(f"{out}/m2d.cXX.txt")
    np.testing.assert_allclose(K_2d, K_ref, atol=5e-6)

    def _cols(path):
        with open(path) as fh:
            head = fh.readline().split()
            rows = [ln.split() for ln in fh]
        j = head.index("p_wald")
        jb = head.index("beta")
        return (np.array([float(r[j]) for r in rows]),
                np.array([float(r[jb]) for r in rows]))

    p_ref, b_ref = _cols(f"{out}/aref.assoc.txt")
    p_2d, b_2d = _cols(f"{out}/a2d.assoc.txt")
    assert p_ref.shape == p_2d.shape
    # f32 spectral-D&C vs f32 device eigh: different algorithms, same
    # p-values within the speed-mode contract (golden tolerance 1e-3)
    np.testing.assert_allclose(p_2d, p_ref, atol=2e-3)
    np.testing.assert_allclose(b_2d, b_ref, atol=2e-3)


def test_mem_guard_trips_on_replicated_n2(_env):
    """The tripwire itself works: a deliberately replicated n² array
    raises with the step tag."""
    import jax.numpy as jnp
    from gemma_tpu.utils.memguard import check

    big = jnp.zeros((N, N), jnp.float32)  # replicated on one device
    with pytest.raises(RuntimeError, match="mem-guard\\[probe\\]"):
        check("probe")
    del big


def test_single_chip_over_hbm_fails_fast(monkeypatch):
    """kinship_mesh on one device with K over HBM raises with guidance
    instead of letting the replicated path OOM mid-run (round-3
    verdict #8; the reference's enforce culture, debug.h:144-191)."""
    from gemma_tpu.parallel.mesh import kinship_mesh

    monkeypatch.setenv("GEMMA_TPU_MAX_DEVICES", "1")
    monkeypatch.setenv("GEMMA_TPU_HBM_GB", "0.001")
    with pytest.raises(RuntimeError, match="exceeds one chip's HBM"):
        kinship_mesh(2048, 4)
    # plenty of memory -> plain replicated path, no mesh
    monkeypatch.setenv("GEMMA_TPU_HBM_GB", "16")
    assert kinship_mesh(2048, 4) is None
