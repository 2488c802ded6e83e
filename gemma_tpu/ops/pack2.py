"""2-bit packed genotype wire format.

Hard-call dosages have four states ({0, 1, 2, missing}), so a block
can cross the host→device link at 2 bits/dosage — 4x less traffic
than the int8 wire (which itself is 8x less than float64).  At the
axon tunnel's ~50 MB/s h2d this is the difference between ~10 s and
~2.5 s for a 50k×10k block; on real hosts it quarters PCIe traffic
the same way.

The bit layout IS the PLINK .bed SNP-major encoding
(/root/reference/src/gemma_io.cpp:940-997: byte b, individual j →
code (b >> 2j) & 3; 0→2.0, 1→missing, 2→1.0, 3→0.0), so .bed blocks
ship as their raw mmap bytes with ZERO host-side decode; other int8
backends pack into the same layout (pack_bed_codes).

Device side, `unpack_bed` turns the (S, ceil(n/4)) uint8 block back
into (S, n) int8 with -1 missing — pure VPU shifts + a 4-entry take,
fused by XLA into the imputation that follows.  Rows padded with 0x55
(code 1 everywhere) decode to all-missing and behave exactly like the
int8 -1 padding.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# code → dosage used on device (int8, -1 missing)
_CODE_TO_I8 = np.array([2, -1, 1, 0], dtype=np.int8)
# int8 dosage → code (index -1 wraps to the last entry = missing code 1)
_I8_TO_CODE = np.array([3, 2, 0, 1], dtype=np.uint8)   # [0,1,2,-1]

# a byte of code-1 (missing) in every slot — the row/column pad byte
PAD_BYTE = 0x55


def packed_width(n: int) -> int:
    return (n + 3) // 4


def pack_bed_codes(Xi8: np.ndarray) -> np.ndarray:
    """(S, n) int8 dosages (-1 missing) → (S, ceil(n/4)) uint8 in .bed
    bit order; slack slots in the last byte pack as missing (they are
    sliced off after the device decode)."""
    S, n = Xi8.shape
    nb = packed_width(n)
    codes = _I8_TO_CODE[Xi8]               # -1 indexes the last entry
    if nb * 4 != n:
        pad = np.full((S, nb * 4 - n), 1, np.uint8)   # code 1 = missing
        codes = np.concatenate([codes, pad], axis=1)
    codes = codes.reshape(S, nb, 4)
    return (codes[:, :, 0] | (codes[:, :, 1] << 2)
            | (codes[:, :, 2] << 4) | (codes[:, :, 3] << 6))


def unpack_bed(packed, n: int):
    """Device decode: (S, nb) uint8 → (S, n) int8 dosages, -1 missing."""
    shifts = jnp.array([0, 2, 4, 6], dtype=jnp.uint8)
    codes = (packed[:, :, None] >> shifts[None, None, :]) & jnp.uint8(3)
    codes = codes.reshape(packed.shape[0], -1)[:, :n]
    return jnp.asarray(_CODE_TO_I8)[codes]
