"""SNP metadata and genotype containers.

Column-oriented (struct-of-arrays) replacements for GEMMA's
vector<SNPINFO> (gemma_io.h) — numpy arrays throughout so QC and
kinship/assoc batching are vectorised, not per-SNP loops.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class SnpTable:
    """Per-SNP metadata in file order (GEMMA SNPINFO analogue)."""

    chr: np.ndarray        # object (strings)
    rs: np.ndarray         # object
    cM: np.ndarray         # float64
    pos: np.ndarray        # int64 (base_position)
    a_minor: np.ndarray    # object (allele1)
    a_major: np.ndarray    # object (allele0)
    # filled by QC:
    n_miss: np.ndarray | None = None      # int64
    missingness: np.ndarray | None = None
    maf: np.ndarray | None = None
    n_idv: np.ndarray | None = None

    def __len__(self):
        return len(self.rs)

    @staticmethod
    def from_lists(chr_, rs, cM, pos, a_minor, a_major) -> "SnpTable":
        return SnpTable(
            chr=np.asarray(chr_, dtype=object),
            rs=np.asarray(rs, dtype=object),
            cM=np.asarray(cM, dtype=np.float64),
            pos=np.asarray(pos, dtype=np.int64),
            a_minor=np.asarray(a_minor, dtype=object),
            a_major=np.asarray(a_major, dtype=object),
        )


@dataclasses.dataclass
class GenotypeData:
    """Genotypes plus metadata.

    X is (n_snps, ni_total) float64 with NaN for missing — the
    in-memory backend.  Streaming backends expose the same block
    iteration API (see iter_blocks) without materialising X.
    """

    snps: SnpTable
    X: np.ndarray
    # per-SNP QC statistics fused into the native parse pass
    # ((p, 8): n_miss, sum, n_0, n_1, n_2, min, max, sumsq over the
    # masked columns) — io/qc.py consumes them instead of re-scanning
    # the matrix; None when the parse ran without a mask
    qc_stats: np.ndarray | None = None
    qc_stats_mask: np.ndarray | None = None

    @property
    def n_snps(self) -> int:
        return self.X.shape[0]

    @property
    def n_individuals(self) -> int:
        return self.X.shape[1]

    def block(self, sel) -> np.ndarray:
        """Decode/slice the rows `sel` (backend-agnostic accessor)."""
        return self.X[sel]

    def iter_blocks(self, block_size: int, snp_mask: np.ndarray | None = None):
        """Yield (snp_indices, raw_block) over (optionally masked) SNPs."""
        idx = np.arange(self.n_snps)
        if snp_mask is not None:
            idx = idx[snp_mask]
        for s in range(0, len(idx), block_size):
            sel = idx[s:s + block_size]
            yield sel, self.block(sel)
