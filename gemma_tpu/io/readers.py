"""Small text readers: phenotypes, covariates, annotation, SNP sets,
kinship matrices, eigen files, GxE, residual weights.

Semantics follow the reference readers in gemma_io.cpp (cited per
function); separators are any mix of space/comma/tab, `NA` is missing.
"""

from __future__ import annotations

import gzip
import io

import numpy as np


def _open_text(path: str):
    if str(path).endswith(".gz"):
        return io.TextIOWrapper(gzip.open(path, "rb"), encoding="ascii")
    return open(path, "r")


def _tokens(line: str):
    return line.replace(",", " ").split()


def read_pheno(path: str, p_columns=(1,)) -> np.ndarray:
    """BIMBAM phenotype file: one column per phenotype, NA missing.

    Returns (n, len(p_columns)) float64 with NaN for missing
    (ReadFile_pheno gemma_io.cpp:386-444).
    """
    rows = []
    with _open_text(path) as fh:
        for line in fh:
            parts = _tokens(line)
            if not parts:
                continue
            row = []
            for k in p_columns:
                tok = parts[k - 1] if len(parts) >= k else "NA"
                row.append(np.nan if tok == "NA" else float(tok))
            rows.append(row)
    return np.asarray(rows, dtype=np.float64)


def read_covariates(path: str):
    """Covariate file; returns (cvt (n, c) float64, indicator (n,) bool).

    A row with any NA is flagged invalid (its values are unusable),
    matching ReadFile_cvt (gemma_io.cpp:447-510).
    """
    rows, ind = [], []
    with _open_text(path) as fh:
        for line in fh:
            parts = _tokens(line)
            if not parts:
                continue
            ok = all(t != "NA" for t in parts)
            rows.append([0.0 if t == "NA" else float(t) for t in parts])
            ind.append(ok)
    n_cols = {len(r) for r, k in zip(rows, ind) if k}
    if len(n_cols) > 1:
        raise ValueError(f"{path}: inconsistent covariate column counts")
    width = max(len(r) for r in rows)
    mat = np.zeros((len(rows), width), dtype=np.float64)
    for i, r in enumerate(rows):
        mat[i, :len(r)] = r
    return mat, np.asarray(ind, dtype=bool)


def read_anno(path: str) -> dict:
    """Annotation `rs, bp, chr[, cM]` → {rs: (chr, bp, cM)}
    (ReadFile_anno gemma_io.cpp:280-341; NA → -9)."""
    anno = {}
    with _open_text(path) as fh:
        for line in fh:
            parts = _tokens(line)
            if not parts:
                continue
            rs = parts[0]
            bp = -9 if (len(parts) < 2 or parts[1] == "NA") else int(float(parts[1]))
            chr_ = "-9" if (len(parts) < 3 or parts[2] == "NA") else parts[2]
            cm = -9.0 if (len(parts) < 4 or parts[3] == "NA") else float(parts[3])
            anno[rs] = (chr_, bp, cm)
    return anno


def read_snp_set(path: str) -> set:
    """-snps/-ksnps/-gwasnps file: first token per line is an rs id."""
    out = set()
    with _open_text(path) as fh:
        for line in fh:
            parts = _tokens(line)
            if parts:
                out.add(parts[0])
    return out


def read_matrix_sidecar(path: str) -> np.ndarray | None:
    """Load `<path>.bin` (written by io.writers.write_matrix with
    sidecar=True) iff it matches the text file's current size+mtime;
    None on any mismatch or absence — the text file is authoritative
    and the reference's outputs have no sidecar."""
    import os
    import struct
    bin_path = path + ".bin"
    try:
        st = os.stat(path)
        with open(bin_path, "rb") as fh:
            if fh.read(8) != b"GTPUMAT1":
                return None
            hdr = fh.read(32)
            if len(hdr) != 32:          # truncated header
                return None
            r, c, size, mtime = struct.unpack("<qqqq", hdr)
            if st.st_size != size or st.st_mtime_ns != mtime:
                return None
            M = np.fromfile(fh, "<f8", r * c)
        if M.size != r * c:
            return None
        return M.reshape(r, c)
    except (OSError, struct.error, ValueError):
        return None


def read_kinship(path: str, indicator_idv: np.ndarray,
                 ids: list | None = None, k_mode: int = 1) -> np.ndarray:
    """Kinship matrix restricted to analyzed individuals.

    k_mode 1: dense ni_total×ni_total text matrix, subset rows/cols by
    indicator_idv (ReadFile_kin gemma_io.cpp:1186-1244).
    k_mode 2: `id1 id2 value` triples (1246-1292).
    """
    indicator_idv = np.asarray(indicator_idv, dtype=bool)
    ni_total = indicator_idv.shape[0]
    ni_test = int(indicator_idv.sum())

    if k_mode == 1:
        keep = np.flatnonzero(indicator_idv)
        M = read_matrix_sidecar(path)
        if M is not None and M.shape == (ni_total, ni_total):
            return np.ascontiguousarray(M[np.ix_(keep, keep)])
        # fast path: pandas' C tokenizer handles the (GB-scale at
        # n=10k+) dense matrix ~20x faster than per-line parsing;
        # fall back for exotic separators / malformed files
        try:
            import pandas as pd
            df = pd.read_csv(path, sep=r"\s+", header=None,
                             dtype=np.float64, engine="c")
            M = df.to_numpy()
            if M.shape == (ni_total, ni_total):
                return np.ascontiguousarray(M[np.ix_(keep, keep)])
        except Exception:
            pass
        rows = []
        with _open_text(path) as fh:
            i_total = 0
            for line in fh:
                parts = _tokens(line)
                if not parts:
                    continue
                if i_total >= ni_total:
                    raise ValueError(f"{path}: more rows than individuals")
                if indicator_idv[i_total]:
                    vals = np.asarray(parts, dtype=np.float64)
                    if vals.shape[0] != ni_total:
                        raise ValueError(
                            f"{path}: row {i_total} has {vals.shape[0]} cols, "
                            f"expected {ni_total}")
                    rows.append(vals[keep])
                i_total += 1
        if i_total != ni_total:
            raise ValueError(f"{path}: {i_total} rows, expected {ni_total}")
        return np.vstack(rows)

    if ids is None:
        raise ValueError("k_mode 2 requires individual ids")
    id2num = {s: i for i, s in enumerate(ids)}
    test_index = -np.ones(ni_total, dtype=np.int64)
    test_index[indicator_idv] = np.arange(ni_test)
    G = np.zeros((ni_test, ni_test), dtype=np.float64)
    with _open_text(path) as fh:
        for line in fh:
            parts = _tokens(line)
            if len(parts) < 3:
                continue
            i1, i2 = id2num.get(parts[0], -1), id2num.get(parts[1], -1)
            if i1 < 0 or i2 < 0:
                continue
            if not (indicator_idv[i1] and indicator_idv[i2]):
                continue
            a, b = test_index[i1], test_index[i2]
            d = float(parts[2])
            if G[a, b] != 0 and G[a, b] != d:
                raise ValueError(f"{path}: conflicting entries for "
                                 f"{parts[0]},{parts[1]}")
            G[a, b] = d
            G[b, a] = d
    return G


def read_gene_expression(path: str):
    """-gene: header line, then `geneID v_1 ... v_n` per gene
    (AnalyzeGene, lmm.cpp:1396-1417).  Returns (ids, (ng, n) matrix)."""
    ids, rows = [], []
    with _open_text(path) as fh:
        next(fh)  # header
        for line in fh:
            parts = _tokens(line)
            if not parts:
                continue
            ids.append(parts[0])
            rows.append([float(v) for v in parts[1:]])
    return ids, np.asarray(rows, dtype=np.float64)


def read_multi_kinship(path: str, indicator_idv: np.ndarray,
                       ids: list | None = None,
                       k_mode: int = 1) -> np.ndarray:
    """-mk: file listing kinship-matrix file paths, one per line
    (ReadFile_mk gemma_io.cpp:1296).  Returns (m, ni_test, ni_test)."""
    mats = []
    with open(path) as fh:
        for line in fh:
            fn = line.strip()
            if fn:
                mats.append(read_kinship(fn, indicator_idv, ids=ids,
                                         k_mode=k_mode))
    if not mats:
        raise ValueError(f"{path}: no kinship files listed")
    return np.stack(mats)


def read_eigen_u(path: str) -> np.ndarray:
    """Eigenvector matrix file (ReadFile_eigenU gemma_io.cpp:1323)."""
    M = read_matrix_sidecar(path)
    if M is not None:
        return M
    try:
        import pandas as pd
        return pd.read_csv(path, sep=r"\s+", header=None,
                           dtype=np.float64, engine="c").to_numpy()
    except Exception:
        return np.loadtxt(path, dtype=np.float64)


def read_eigen_d(path: str) -> np.ndarray:
    """Eigenvalue vector file (ReadFile_eigenD gemma_io.cpp:1372)."""
    return np.loadtxt(path, dtype=np.float64).ravel()


def read_gxe(path: str):
    """Single-column environmental variable; returns (values, indicator)."""
    vals, ind = [], []
    with _open_text(path) as fh:
        for line in fh:
            parts = _tokens(line)
            if not parts:
                continue
            if parts[0] == "NA":
                vals.append(0.0)
                ind.append(False)
            else:
                vals.append(float(parts[0]))
                ind.append(True)
    return np.asarray(vals), np.asarray(ind, dtype=bool)


def read_weights(path: str):
    """Residual weights (-widv); returns (values, indicator)."""
    return read_gxe(path)
