"""BIMBAM mean-genotype reader.

Format (reference gemma_io.cpp:639-873, README.md:299-308): one SNP
per line — `rs, allele1, allele0, g_1, g_2, ...` with dosages in
[0, 2], `NA` for missing, separated by any mix of comma/space/tab.

Unlike GEMMA's two-pass char-by-char strtok streaming (which costs it
~30% of kinship wall time, doc/developers/profiling.md), this reader
tokenises each line once into a numpy row; QC, imputation and
centering happen vectorised downstream (io/qc.py, ops/kinship.py).
"""

from __future__ import annotations

import gzip
import io

import numpy as np

from gemma_tpu.io.tables import SnpTable, GenotypeData


def _open_text(path: str):
    if str(path).endswith(".gz"):
        return io.TextIOWrapper(gzip.open(path, "rb"), encoding="ascii")
    return open(path, "r")


def read_bimbam_genotypes(path: str, n_individuals: int | None = None,
                          stat_mask: np.ndarray | None = None
                          ) -> GenotypeData:
    """Load a BIMBAM mean-genotype file into a GenotypeData.

    Uses the native C++ parser (gemma_tpu.io.native) when available —
    ~30x faster than the Python tokenizer — with a pure-Python
    fallback.  n_individuals, if given, validates the column count.

    stat_mask (bool (n,), the analyzed-individual indicator) fuses the
    per-SNP QC statistic scan into the parse pass; the result carries
    `qc_stats`/`qc_stats_mask` for io/qc.py.
    """
    from gemma_tpu.io import native
    parsed = None
    if stat_mask is not None and native.available():
        dims = native.bimbam_dims(path)
        if dims is not None and dims[1] == len(stat_mask):
            parsed = native.parse_bimbam(path, stat_mask=stat_mask)
    if parsed is None:
        stat_mask = None
        parsed = native.parse_bimbam(path)
    if parsed is None:
        import warnings
        warnings.warn(
            "native BIMBAM parser unavailable (libgemma_native build "
            "failed?) — falling back to the ~30x slower Python "
            "tokenizer; large inputs will be ingestion-bound")
    if parsed is not None:
        rs, a1, a0, X = parsed[:4]
        stats = parsed[4] if len(parsed) > 4 else None
        if n_individuals is not None and X.shape[1] != n_individuals:
            raise ValueError(
                f"{path}: {X.shape[1]} genotype columns, expected "
                f"{n_individuals}")
        p = X.shape[0]
        snps = SnpTable.from_lists(
            chr_=["-9"] * p, rs=rs, cM=[-9.0] * p, pos=[-9] * p,
            a_minor=a1, a_major=a0)
        return GenotypeData(
            snps=snps, X=X, qc_stats=stats,
            qc_stats_mask=(None if stats is None
                           else np.asarray(stat_mask, bool)))

    rs_list, a1_list, a0_list = [], [], []
    rows = []
    with _open_text(path) as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            # normalise separators, NA → nan in one pass
            parts = line.replace(",", " ").split()
            rs_list.append(parts[0])
            a1_list.append(parts[1])
            a0_list.append(parts[2])
            vals = np.array(
                [v if v != "NA" else "nan" for v in parts[3:]],
                dtype=np.float64)
            if n_individuals is not None and vals.shape[0] != n_individuals:
                raise ValueError(
                    f"{path}: SNP {parts[0]} has {vals.shape[0]} genotypes, "
                    f"expected {n_individuals}")
            rows.append(vals)

    if not rows:
        raise ValueError(f"{path}: empty genotype file")
    X = np.vstack(rows)
    p = X.shape[0]
    snps = SnpTable.from_lists(
        chr_=["-9"] * p,
        rs=rs_list,
        cM=[-9.0] * p,
        pos=[-9] * p,
        a_minor=a1_list,
        a_major=a0_list,
    )
    return GenotypeData(snps=snps, X=X)


class StreamingBimbamGenotypes:
    """GenotypeData-compatible bounded-memory BIMBAM backend.

    Construction does one metadata-only native pass (rs/alleles; the
    dosage fields are never tokenised).  `block(sel)` streams forward
    through an open native reader — monotone access patterns (QC,
    kinship accumulation, association batching all walk the file in
    order) each cost exactly one file scan, the reference's own
    two-pass posture (ReadFile_geno gemma_io.cpp:639-873 then
    BimbamKin:1418-1597) with the (p, n) matrix never materialised.
    Non-monotone access reopens the stream (a new pass)."""

    def __init__(self, path: str):
        from gemma_tpu.io import native
        dims = native.bimbam_dims(path)
        if dims is None:
            raise RuntimeError(
                f"native parser unavailable; cannot stream {path}")
        self._path = path
        p, n = dims
        self._n = n
        self._p = p
        stream = native.BimbamStream(path, n)
        rs, a1, a0 = [], [], []
        while True:
            _, r, x1, x0 = stream.read_block(8192, metadata_only=True)
            if not r:
                break
            rs += r
            a1 += x1
            a0 += x0
        stream.close()
        self.snps = SnpTable.from_lists(
            chr_=["-9"] * p, rs=rs, cM=[-9.0] * p, pos=[-9] * p,
            a_minor=a1, a_major=a0)
        self._stream = None
        self._X = None

    @property
    def n_snps(self) -> int:
        return self._p

    @property
    def n_individuals(self) -> int:
        return self._n

    def _ensure_stream_at(self, row: int):
        from gemma_tpu.io import native
        if self._stream is None or self._stream.row > row:
            if self._stream is not None:
                self._stream.close()
            self._stream = native.BimbamStream(self._path, self._n)
        # skip forward to `row` (rows are parsed-and-discarded; the
        # reference pays the same tokenisation cost when streaming)
        while self._stream.row < row:
            step = min(8192, row - self._stream.row)
            _, r, _, _ = self._stream.read_block(step, metadata_only=True)
            if not r:
                break

    def block(self, sel) -> np.ndarray:
        sel = np.asarray(sel)
        if self._X is not None:
            return self._X[sel]
        if sel.size == 0:
            return np.empty((0, self._n))
        lo, hi = int(sel.min()), int(sel.max())
        self._ensure_stream_at(lo)
        start = self._stream.row
        span = np.empty((hi + 1 - start, self._n), dtype=np.float64)
        filled = 0
        while filled < span.shape[0]:
            X, r, _, _ = self._stream.read_block(
                min(8192, span.shape[0] - filled))
            if not r:
                break
            span[filled:filled + len(r)] = X
            filled += len(r)
        if filled < span.shape[0]:
            # fewer rows than the metadata pass counted: the file was
            # truncated or modified mid-run — np.empty rows must never
            # be silently returned as dosages
            raise IOError(
                f"{self._path}: stream ended at row {start + filled}, "
                f"expected at least {hi + 1} rows (file truncated or "
                "modified while streaming)")
        return span[sel - start]

    def qc_stats(self, stat_mask: np.ndarray) -> np.ndarray:
        """One native streaming pass computing the (p, 8) per-SNP QC
        statistic array over the masked columns (no Python-side
        matrix ever materialises; see native.bimbam_read_block_stats).
        """
        from gemma_tpu.io import native
        stream = native.BimbamStream(self._path, self._n)
        parts = []
        mask = np.ascontiguousarray(stat_mask, dtype=np.uint8)
        while True:
            out = stream.read_block(8192, metadata_only=True,
                                    stat_mask=mask)
            if not out[1]:
                break
            parts.append(out[4])
        stream.close()
        stats = (np.concatenate(parts) if parts
                 else np.empty((0, 8), np.float64))
        if stats.shape[0] != self._p:
            raise IOError(
                f"{self._path}: QC pass saw {stats.shape[0]} rows, "
                f"metadata pass counted {self._p}")
        return stats

    @property
    def X(self) -> np.ndarray:
        # legacy full materialisation (predict/BSLMM random access)
        if self._X is None:
            self._X = self.block(np.arange(self._p))
        return self._X

    def iter_blocks(self, block_size: int, snp_mask=None):
        idx = np.arange(self._p)
        if snp_mask is not None:
            idx = idx[snp_mask]
        for s in range(0, len(idx), block_size):
            sel = idx[s:s + block_size]
            yield sel, self.block(sel)


def annotate_snps(snps: SnpTable, anno: dict) -> None:
    """Attach chr/pos/cM from an annotation map (ReadFile_anno semantics:
    unknown rs → chr '-9', pos -9, cM -9; gemma_io.cpp:726-740)."""
    chr_, pos, cM = [], [], []
    for rs in snps.rs:
        if rs in anno:
            c, b, m = anno[rs]
            chr_.append(c)
            pos.append(b)
            cM.append(m)
        else:
            chr_.append("-9")
            pos.append(-9)
            cM.append(-9.0)
    snps.chr = np.asarray(chr_, dtype=object)
    snps.pos = np.asarray(pos, dtype=np.int64)
    snps.cM = np.asarray(cM, dtype=np.float64)
