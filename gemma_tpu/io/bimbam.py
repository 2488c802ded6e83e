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
import os
import zipfile

import numpy as np

from gemma_tpu.io.tables import SnpTable, GenotypeData


def _open_text(path: str):
    if str(path).endswith(".gz"):
        return io.TextIOWrapper(gzip.open(path, "rb"), encoding="ascii")
    return open(path, "r")


# ---------------------------------------------------------------------------
# binary parse cache ("genotype sidecar")
#
# The reference re-tokenises the text genotype file on every run —
# measured at ~30% of its -gk wall (doc/developers/profiling.md) and
# ~2.1 s of the warm mouse-scale -lmm here.  Like the kinship-matrix
# sidecar (io/writers.py), the first parse caches its EXACT result in
# a binary file next to the source; later runs load it at mmap speed.
# Hard-call files (every dosage in {0,1,2}) store int8 (-1 missing) —
# also the host→device wire format — fractional dosages store the
# full float64 matrix, so the cache is bit-identical to the parse in
# both cases.  Invalidation: source size + mtime_ns (checked inside
# the file).  Cache entries live under ~/.cache/gemma_tpu/geno/, NOT
# next to the source — input directories are often read-only or
# shared, and a tool must not write into them.

_SIDECAR_VER = 1


def _sidecar_path(path: str) -> str:
    import hashlib
    key = hashlib.sha1(os.path.abspath(path).encode()).hexdigest()
    d = os.environ.get(
        "GEMMA_TPU_GENO_SIDECAR_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "gemma_tpu",
                     "geno"))
    return os.path.join(d, key + ".npz")


def _sidecar_enabled() -> bool:
    return os.environ.get("GEMMA_TPU_GENO_SIDECAR", "1") != "0"


def _as_i8(X: np.ndarray) -> np.ndarray | None:
    """(p, n) int8 hard-call encoding (-1 missing), or None when any
    dosage is fractional / out of the {0,1,2} set (EXACTNESS gate: the
    sidecar must reproduce the parse bit-for-bit)."""
    from gemma_tpu.io import native
    if native.available():
        return native.f64_to_i8_hardcalls(X)
    m = np.isnan(X)
    v = np.where(m, -1.0, X)
    Xi8 = v.astype(np.int8)
    if ((Xi8 >= 0) | m).all() and (Xi8 <= 2).all() and (Xi8 == v).all():
        return Xi8
    return None


def _save_sidecar(path: str, rs, a1, a0, X, Xi8, stats, stat_mask) -> None:
    try:
        st = os.stat(path)
        payload = dict(
            ver=np.int64(_SIDECAR_VER),
            src_size=np.int64(st.st_size),
            src_mtime_ns=np.int64(st.st_mtime_ns),
            rs=np.asarray(rs, dtype="U"), a1=np.asarray(a1, dtype="U"),
            a0=np.asarray(a0, dtype="U"))
        if Xi8 is not None:
            payload["X_i8"] = Xi8
        else:
            payload["X_f64"] = X
        if stats is not None:
            payload["stats"] = stats
            payload["stats_mask"] = np.asarray(stat_mask, bool)
        sp = _sidecar_path(path)
        os.makedirs(os.path.dirname(sp), exist_ok=True)
        tmp = sp + f".tmp{os.getpid()}"
        with open(tmp, "wb") as fh:
            np.savez(fh, **payload)
        os.replace(tmp, sp)
    except OSError:
        pass


def _load_sidecar(path: str, stat_mask):
    """Returns a genotype backend loaded from the sidecar, or None."""
    sp = _sidecar_path(path)
    try:
        st = os.stat(path)
        if not os.path.exists(sp):
            return None
        z = np.load(sp, allow_pickle=False)
        if (int(z["ver"]) != _SIDECAR_VER
                or int(z["src_size"]) != st.st_size
                or int(z["src_mtime_ns"]) != st.st_mtime_ns):
            return None
        rs = list(z["rs"])
        a1 = list(z["a1"])
        a0 = list(z["a0"])
    except (OSError, ValueError, KeyError, zipfile.BadZipFile):
        return None
    p = len(rs)
    snps = SnpTable.from_lists(
        chr_=["-9"] * p, rs=rs, cM=[-9.0] * p, pos=[-9] * p,
        a_minor=a1, a_major=a0)
    stats = stored_mask = None
    if "stats" in z.files and stat_mask is not None:
        stored_mask = np.asarray(z["stats_mask"], bool)
        if (stored_mask.shape == np.shape(stat_mask)
                and np.array_equal(stored_mask, stat_mask)):
            stats = np.asarray(z["stats"])
        else:
            stored_mask = None
    if "X_i8" in z.files:
        return Int8Genotypes(snps, np.asarray(z["X_i8"]), qc_stats=stats,
                             qc_stats_mask=stored_mask)
    return GenotypeData(snps=snps, X=np.asarray(z["X_f64"]),
                        qc_stats=stats, qc_stats_mask=stored_mask)


class Int8Genotypes:
    """GenotypeData-compatible hard-call backend: dosages live as one
    (p, n) int8 matrix (-1 missing) — the host→device wire format, so
    kinship/association blocks ship without a float64 round-trip, and
    QC statistics come from integer ops (io/qc.qc_stats_from_i8)."""

    integral_dosages = True

    def __init__(self, snps: SnpTable, Xi8: np.ndarray,
                 qc_stats: np.ndarray | None = None,
                 qc_stats_mask: np.ndarray | None = None):
        self.snps = snps
        self._Xi8 = Xi8
        self._stats = qc_stats
        self._stats_mask = qc_stats_mask
        self._X = None

    @property
    def n_snps(self) -> int:
        return self._Xi8.shape[0]

    @property
    def n_individuals(self) -> int:
        return self._Xi8.shape[1]

    def block(self, sel) -> np.ndarray:
        b = self._Xi8[sel].astype(np.float64)
        b[b < 0] = np.nan
        return b

    def block_i8(self, sel) -> np.ndarray:
        return self._Xi8[sel]

    def qc_stats(self, stat_mask: np.ndarray) -> np.ndarray:
        if (self._stats is not None and self._stats_mask is not None
                and np.array_equal(self._stats_mask, stat_mask)):
            return self._stats
        from gemma_tpu.io.qc import qc_stats_from_i8
        return qc_stats_from_i8(self._Xi8, stat_mask)

    @property
    def X(self) -> np.ndarray:
        if self._X is None:
            self._X = self.block(np.arange(self.n_snps))
        return self._X

    def iter_blocks(self, block_size: int, snp_mask=None):
        idx = np.arange(self.n_snps)
        if snp_mask is not None:
            idx = idx[snp_mask]
        for s in range(0, len(idx), block_size):
            sel = idx[s:s + block_size]
            yield sel, self.block(sel)


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
    if _sidecar_enabled():
        cached = _load_sidecar(path, stat_mask)
        if cached is not None:
            if (n_individuals is not None
                    and cached.n_individuals != n_individuals):
                raise ValueError(
                    f"{path}: {cached.n_individuals} genotype columns, "
                    f"expected {n_individuals}")
            return cached
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
        Xi8 = _as_i8(X)
        if _sidecar_enabled():
            _save_sidecar(path, rs, a1, a0, X, Xi8, stats, stat_mask)
        p = X.shape[0]
        snps = SnpTable.from_lists(
            chr_=["-9"] * p, rs=rs, cM=[-9.0] * p, pos=[-9] * p,
            a_minor=a1, a_major=a0)
        mask_arr = (None if stats is None
                    else np.asarray(stat_mask, bool))
        if Xi8 is not None:
            return Int8Genotypes(snps, Xi8, qc_stats=stats,
                                 qc_stats_mask=mask_arr)
        return GenotypeData(snps=snps, X=X, qc_stats=stats,
                            qc_stats_mask=mask_arr)

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
