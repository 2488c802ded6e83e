"""Streaming BIMBAM backend equality: GEMMA_TPU_STREAM=1 routes -g
through the bounded-memory native stream (io/bimbam.py
StreamingBimbamGenotypes); outputs must match the in-memory backend
exactly.  Mirrors the reference's own two-pass streaming contract
(gemma_io.cpp:639-873, 1418-1597)."""

import os

import numpy as np
import pytest

from gemma_tpu.cli import parse_args
from gemma_tpu.io import native
from gemma_tpu.run import batch_run

EXAMPLE = "/root/reference/example"

pytestmark = pytest.mark.skipif(
    not (os.path.exists(f"{EXAMPLE}/BXD_geno.txt.gz") and
         native.available()),
    reason="BXD data or native parser not available")


def test_streaming_backend_matches_inmemory(tmp_path, monkeypatch):
    out = str(tmp_path)
    common = (f"-g {EXAMPLE}/BXD_geno.txt.gz -p {EXAMPLE}/BXD_pheno.txt "
              f"-outdir {out} -precision float64 -no-check")

    monkeypatch.setenv("GEMMA_TPU_STREAM", "0")
    batch_run(parse_args((common + " -gk -o mem").split()))
    batch_run(parse_args(
        (common + f" -k {out}/mem.cXX.txt -lmm 1 -o memA").split()))

    monkeypatch.setenv("GEMMA_TPU_STREAM", "1")
    batch_run(parse_args((common + " -gk -o str").split()))
    batch_run(parse_args(
        (common + f" -k {out}/mem.cXX.txt -lmm 1 -o strA").split()))

    K_mem = np.loadtxt(f"{out}/mem.cXX.txt")
    K_str = np.loadtxt(f"{out}/str.cXX.txt")
    np.testing.assert_allclose(K_str, K_mem, rtol=0, atol=1e-10)

    for fn in ("memA.assoc.txt", "strA.assoc.txt"):
        assert os.path.exists(f"{out}/{fn}")
    a_mem = open(f"{out}/memA.assoc.txt").read()
    a_str = open(f"{out}/strA.assoc.txt").read()
    assert a_mem == a_str


def test_streaming_block_random_access():
    """block(sel) is correct for monotone AND backward access (the
    latter reopens the stream for a fresh pass)."""
    from gemma_tpu.io.bimbam import (StreamingBimbamGenotypes,
                                     read_bimbam_genotypes)
    path = f"{EXAMPLE}/BXD_geno.txt.gz"
    mem = read_bimbam_genotypes(path)
    st = StreamingBimbamGenotypes(path)
    assert st.n_snps == mem.n_snps
    assert st.n_individuals == mem.n_individuals
    assert list(st.snps.rs[:5]) == list(mem.snps.rs[:5])

    sel1 = np.arange(10, 40)
    np.testing.assert_array_equal(
        np.nan_to_num(st.block(sel1)), np.nan_to_num(mem.block(sel1)))
    sel2 = np.arange(100, 130)        # forward (same pass)
    np.testing.assert_array_equal(
        np.nan_to_num(st.block(sel2)), np.nan_to_num(mem.block(sel2)))
    sel3 = np.arange(0, 20)           # backward (new pass)
    np.testing.assert_array_equal(
        np.nan_to_num(st.block(sel3)), np.nan_to_num(mem.block(sel3)))
    # sparse selection within a span
    sel4 = np.array([5, 17, 200, 201, 500])
    np.testing.assert_array_equal(
        np.nan_to_num(st.block(sel4)), np.nan_to_num(mem.block(sel4)))
