"""2-bit packed genotype wire (ops/pack2): exactness + CLI equality.

The packed path must be invisible: identical K and identical
association statistics whether blocks cross the link as packed uint8,
int8, or float64 (GEMMA_TPU_PACK2=0)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "scripts"))

from gemma_tpu.ops.pack2 import (pack_bed_codes, unpack_bed,
                                 packed_width, PAD_BYTE)


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    for n in (1, 3, 4, 7, 64, 101):
        Xi8 = rng.integers(-1, 3, size=(13, n)).astype(np.int8)
        packed = pack_bed_codes(Xi8)
        assert packed.shape == (13, packed_width(n))
        out = np.asarray(unpack_bed(packed, n))
        np.testing.assert_array_equal(out, Xi8)


def test_pad_byte_decodes_to_missing():
    packed = np.full((2, 5), PAD_BYTE, np.uint8)
    out = np.asarray(unpack_bed(packed, 18))
    assert (out == -1).all()


def test_bed_raw_bytes_match_packed_codes(tmp_path):
    """A .bed body row IS the packed wire for its SNP (slack bits in
    the final byte differ but decode past n and are sliced off)."""
    from synth_biobank import write_plink
    from gemma_tpu.io.plink import read_plink

    prefix = str(tmp_path / "s")
    write_plink(prefix, 30, 50, h2=0.5, seed=3)   # n=30: 2 slack slots
    geno, _, _ = read_plink(prefix)
    sel = np.arange(50)
    raw = geno.block_bed(sel)
    via_i8 = np.asarray(unpack_bed(raw, 30))
    np.testing.assert_array_equal(via_i8, geno.block_i8(sel))


@pytest.mark.parametrize("drop_idv", [False, True])
def test_cli_equality_packed_vs_unpacked(tmp_path, drop_idv):
    """-gk + -lmm 1 produce identical outputs with the packed wire on
    and off, on a PLINK dataset (raw-bed fast path when every
    individual is analyzed; host repack when some are dropped)."""
    from synth_biobank import write_plink
    from gemma_tpu.cli import parse_args
    from gemma_tpu.run import batch_run

    prefix = str(tmp_path / "s")
    n = 46
    write_plink(prefix, n, 300, h2=0.5, seed=5)
    if drop_idv:
        # knock two phenotypes out so indicator_idv is not all-true
        fam = open(prefix + ".fam").read().splitlines()
        parts = fam[3].split()
        parts[5] = "NA"
        fam[3] = " ".join(parts)
        parts = fam[10].split()
        parts[5] = "-9"
        fam[10] = " ".join(parts)
        open(prefix + ".fam", "w").write("\n".join(fam) + "\n")

    def run(tag, pack):
        os.environ["GEMMA_TPU_PACK2"] = "1" if pack else "0"
        try:
            common = f"-bfile {prefix} -outdir {tmp_path} -no-check"
            batch_run(parse_args((common + f" -gk -o K{tag}").split()))
            batch_run(parse_args(
                (common + f" -k {tmp_path}/K{tag}.cXX.txt -lmm 1 "
                 f"-o A{tag}").split()))
        finally:
            os.environ.pop("GEMMA_TPU_PACK2", None)
        K = np.loadtxt(f"{tmp_path}/K{tag}.cXX.txt")
        with open(f"{tmp_path}/A{tag}.assoc.txt") as fh:
            assoc = fh.read()
        return K, assoc

    K1, A1 = run("p", True)
    K0, A0 = run("u", False)
    np.testing.assert_array_equal(K1, K0)
    assert A1 == A0
