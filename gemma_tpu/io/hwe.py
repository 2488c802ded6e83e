"""Hardy-Weinberg equilibrium exact test.

Wigginton/Cutler/Abecasis (2005) exact test as used by GEMMA's
`CalcHWE` (mathfunc.cpp): the p-value is the summed probability of all
heterozygote counts no more likely than the observed one, under the
hypergeometric HWE distribution.  Computed per SNP on the host; the
HWE filter is off by default (-hwe 0) so this is not a hot path.
"""

from __future__ import annotations

import numpy as np


def hwe_exact_p(n_hom1: int, n_hom2: int, n_het: int) -> float:
    if (n_hom1 + n_hom2 + n_het) == 0:
        return 1.0

    n_aa = min(n_hom1, n_hom2)   # rare homozygote
    rare = 2 * n_aa + n_het
    genotypes = n_het + n_hom1 + n_hom2

    probs = np.zeros(rare + 1)
    mid = rare * (2 * genotypes - rare) // (2 * genotypes)
    if (rare & 1) != (mid & 1):
        mid += 1

    probs[mid] = 1.0
    # downward recursion: two fewer hets, one more of each homozygote
    homr = (rare - mid) // 2
    homc = genotypes - mid - homr
    h, r, c = mid, homr, homc
    while h > 1:
        probs[h - 2] = probs[h] * h * (h - 1.0) / (4.0 * (r + 1.0) * (c + 1.0))
        r += 1
        c += 1
        h -= 2
    # upward recursion
    h, r, c = mid, homr, homc
    while h <= rare - 2:
        probs[h + 2] = probs[h] * 4.0 * r * c / ((h + 2.0) * (h + 1.0))
        r -= 1
        c -= 1
        h += 2

    probs /= probs.sum()
    p = probs[probs <= probs[n_het]].sum()
    return float(min(p, 1.0))
