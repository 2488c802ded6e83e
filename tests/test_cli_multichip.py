"""Multi-chip CLI equality: the production drivers produce identical
output files on a 1-device and an 8-device mesh.

run_gk/run_lmm route every block through the SNP-sharded shard_map
pipeline (parallel/shard.py) via `default_mesh()`; capping the mesh at
one device with GEMMA_TPU_MAX_DEVICES degenerates to the single-chip
program, so comparing the two runs validates that the collectives
(psum kinship merge, sharded assoc) only partition work, never change
the math — through the real CLI entry point, not standalone kernels.
"""

import os

import numpy as np
import pytest

from gemma_tpu.cli import parse_args
from gemma_tpu.run import batch_run

EXAMPLE = "/root/reference/example"
ISSUE188 = "/root/reference/test/data/issue188/2000"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{EXAMPLE}/BXD_geno.txt.gz"),
    reason="BXD example data not available")


def _run_with_devices(monkeypatch, n, args):
    monkeypatch.setenv("GEMMA_TPU_MAX_DEVICES", str(n))
    batch_run(parse_args(args.split()))


def _read_assoc(path):
    with open(path) as fh:
        lines = [ln.rstrip("\n").split("\t") for ln in fh]
    header, rows = lines[0], lines[1:]
    cols = {}
    for j, name in enumerate(header):
        try:
            cols[name] = np.array([float(r[j]) for r in rows])
        except ValueError:
            pass
    return cols


def test_gk_lmm_bimbam_1_vs_8_devices(tmp_path, monkeypatch):
    out = str(tmp_path)
    common = (f"-g {EXAMPLE}/BXD_geno.txt.gz -p {EXAMPLE}/BXD_pheno.txt "
              f"-outdir {out} -precision float64 -no-check")

    _run_with_devices(monkeypatch, 1, common + " -gk -o K1")
    _run_with_devices(monkeypatch, 8, common + " -gk -o K8")
    K1 = np.loadtxt(f"{out}/K1.cXX.txt")
    K8 = np.loadtxt(f"{out}/K8.cXX.txt")
    np.testing.assert_allclose(K8, K1, rtol=0, atol=1e-8)

    _run_with_devices(monkeypatch, 1,
                      common + f" -k {out}/K1.cXX.txt -lmm 4 -o A1")
    _run_with_devices(monkeypatch, 8,
                      common + f" -k {out}/K1.cXX.txt -lmm 4 -o A8")
    a1 = _read_assoc(f"{out}/A1.assoc.txt")
    a8 = _read_assoc(f"{out}/A8.assoc.txt")
    for col in ("beta", "se", "p_wald", "p_lrt", "p_score", "l_remle"):
        np.testing.assert_allclose(a8[col], a1[col], rtol=1e-10,
                                   err_msg=col)


@pytest.mark.skipif(not os.path.exists(ISSUE188 + ".bed"),
                    reason="issue188 PLINK data not available")
def test_gk_lmm_plink_int8_wire_1_vs_8_devices(tmp_path, monkeypatch):
    """PLINK path: exercises the int8 wire encoding + on-device
    imputation inside the sharded pipeline."""
    out = str(tmp_path)
    common = (f"-bfile {ISSUE188} -outdir {out} -precision float64 "
              "-no-check")

    _run_with_devices(monkeypatch, 1, common + " -gk 2 -o K1")
    _run_with_devices(monkeypatch, 8, common + " -gk 2 -o K8")
    K1 = np.loadtxt(f"{out}/K1.sXX.txt")
    K8 = np.loadtxt(f"{out}/K8.sXX.txt")
    np.testing.assert_allclose(K8, K1, rtol=0, atol=1e-8)

    _run_with_devices(monkeypatch, 1,
                      common + f" -k {out}/K1.sXX.txt -lmm 1 -o A1")
    _run_with_devices(monkeypatch, 8,
                      common + f" -k {out}/K1.sXX.txt -lmm 1 -o A8")
    a1 = _read_assoc(f"{out}/A1.assoc.txt")
    a8 = _read_assoc(f"{out}/A8.assoc.txt")
    for col in ("beta", "se", "p_wald"):
        np.testing.assert_allclose(a8[col], a1[col], rtol=1e-10,
                                   err_msg=col)
