"""GEMMA-compatible output writers.

File layouts follow the reference exactly so downstream tooling (and
the golden regression tests) can consume either implementation:
  * assoc.txt: LMM::WriteFiles (lmm.cpp:101-225) — stats in scientific
    6-digit, af fixed 3-digit; mode-dependent columns.
  * dense matrices / vectors: PARAM::WriteMatrix/WriteVector
    (param.cpp:1886, precision 10, tab-separated).
"""

from __future__ import annotations

import os

import numpy as np


def _fmt_g10(v: float) -> str:
    """C++ default-notation precision(10) (param.cpp:1828 etc.)."""
    return f"{v:.10g}"


def _fmt_sci6(v: float) -> str:
    if isinstance(v, (float, np.floating)) and np.isnan(v):
        return "nan"
    return f"{v:.6e}"


def write_matrix(path: str, M: np.ndarray, sidecar: bool = False) -> None:
    """Tab-separated %.10g matrix (WriteMatrix, param.cpp:1820-1890).

    The native writer is ~10x the Python formatter and byte-identical;
    numpy savetxt is the fallback (also byte-identical — verified in
    test_native.py).

    sidecar=True additionally drops a binary `<path>.bin` cache next
    to the text file: re-reading the n×n kinship/eigenvector text
    costs seconds-to-minutes at scale (26 s at n=10k, PERF.md) while
    the raw float64 image loads in milliseconds.  The sidecar records
    the text file's size+mtime and is ignored whenever they do not
    match (the text file remains the interchange format; the reference
    knows nothing of the cache and never needs to)."""
    M = np.asarray(M, dtype=np.float64)
    if M.ndim == 1:
        M = M[None, :]
    from gemma_tpu.io import native
    if not native.write_matrix_g10(path, M):
        np.savetxt(path, M, fmt="%.10g", delimiter="\t")
    if sidecar:
        write_matrix_sidecar(path, M)


_SIDECAR_MAGIC = b"GTPUMAT1"


def write_matrix_sidecar(path: str, M: np.ndarray) -> None:
    """Binary cache of a matrix just written as text at `path`."""
    import struct
    try:
        st = os.stat(path)
        with open(path + ".bin", "wb") as fh:
            fh.write(_SIDECAR_MAGIC)
            fh.write(struct.pack("<qqqq", M.shape[0], M.shape[1],
                                 st.st_size, st.st_mtime_ns))
            np.ascontiguousarray(M, dtype="<f8").tofile(fh)
    except OSError:
        # cache is best-effort; the text file is authoritative
        pass


def write_vector(path: str, v: np.ndarray) -> None:
    with open(path, "w") as fh:
        for x in np.asarray(v).ravel():
            fh.write(_fmt_g10(x) + "\n")


# ---------------------------------------------------------------------------
# assoc.txt (univariate LMM / LM)

def _lmm_stat_columns(mode: int):
    cols = []
    if mode != 2:
        cols += ["beta", "se"]
    if mode not in (3, 9):
        cols += ["logl_H1"]
    if mode == 1:
        cols += ["l_remle", "p_wald"]
    elif mode in (2, 9):
        cols += ["l_mle", "p_lrt"]
    elif mode == 3:
        cols += ["p_score"]
    elif mode == 4:
        cols += ["l_remle", "l_mle", "p_wald", "p_lrt", "p_score"]
    return cols


def write_lmm_assoc(path: str, mode: int, snp_rows: list, stats: dict) -> None:
    """snp_rows: list of dicts with chr/rs/ps/n_miss/allele1/allele0/af;
    stats: dict of column name → array aligned with snp_rows."""
    cols = _lmm_stat_columns(mode)
    with open(path, "w") as fh:
        fh.write("chr\trs\tps\tn_miss\tallele1\tallele0\taf\t")
        fh.write("\t".join(cols) + "\n")
        for i, s in enumerate(snp_rows):
            fh.write(f"{s['chr']}\t{s['rs']}\t{s['ps']}\t{s['n_miss']}\t"
                     f"{s['allele1']}\t{s['allele0']}\t{s['af']:.3f}\t")
            fh.write("\t".join(_fmt_sci6(float(stats[c][i])) for c in cols))
            fh.write("\n")


def _lm_stat_columns(mode: int):
    # lm.cpp:83-222: mode 51 Wald, 52 LRT, 53 score, 54 all
    if mode == 51:
        return ["beta", "se", "p_wald"]
    if mode == 52:
        return ["p_lrt"]
    if mode == 53:
        return ["beta", "se", "p_score"]
    return ["beta", "se", "p_wald", "p_lrt", "p_score"]


def write_lm_gene_assoc(path: str, mode: int, gene_ids: list,
                        stats: dict) -> None:
    """Gene-expression -lm assoc.txt (lm.cpp:94-160)."""
    cols = _lm_stat_columns(mode)
    with open(path, "w") as fh:
        fh.write("geneID\t")
        fh.write("\t".join(cols) + "\n")
        for i, gid in enumerate(gene_ids):
            fh.write(f"{gid}\t")
            fh.write("\t".join(_fmt_sci6(float(stats[c][i])) for c in cols))
            fh.write("\n")


def write_lm_assoc(path: str, mode: int, snp_rows: list, stats: dict) -> None:
    cols = _lm_stat_columns(mode)
    with open(path, "w") as fh:
        fh.write("chr\trs\tps\tn_miss\tallele1\tallele0\taf\t")
        fh.write("\t".join(cols) + "\n")
        for i, s in enumerate(snp_rows):
            fh.write(f"{s['chr']}\t{s['rs']}\t{s['ps']}\t{s['n_miss']}\t"
                     f"{s['allele1']}\t{s['allele0']}\t{s['af']:.3f}\t")
            fh.write("\t".join(_fmt_sci6(float(stats[c][i])) for c in cols))
            fh.write("\n")


def write_mvlmm_assoc(path: str, mode: int, n_ph: int, snp_rows: list,
                      beta: np.ndarray, Vbeta: np.ndarray,
                      p_wald, p_lrt, p_score) -> None:
    """mvLMM assoc.txt (MVLMM::WriteFiles, mvlmm.cpp:117-210):
    beta_1..d, upper-triangle Vbeta_i_j, then the mode's p column(s)."""
    d = n_ph
    with open(path, "w") as fh:
        fh.write("chr\trs\tps\tn_miss\tallele1\tallele0\taf\t")
        cols = [f"beta_{i+1}" for i in range(d)]
        cols += [f"Vbeta_{i+1}_{j+1}" for i in range(d) for j in range(i, d)]
        if mode == 1:
            cols += ["p_wald"]
        elif mode == 2:
            cols += ["p_lrt"]
        elif mode == 3:
            cols += ["p_score"]
        elif mode == 4:
            cols += ["p_wald", "p_lrt", "p_score"]
        fh.write("\t".join(cols) + "\n")
        for t, s in enumerate(snp_rows):
            fh.write(f"{s['chr']}\t{s['rs']}\t{s['ps']}\t{s['n_miss']}\t"
                     f"{s['allele1']}\t{s['allele0']}\t{s['af']:.3f}\t")
            vals = [beta[t, i] for i in range(d)]
            vals += [Vbeta[t, i, j] for i in range(d) for j in range(i, d)]
            if mode == 1:
                vals += [p_wald[t]]
            elif mode == 2:
                vals += [p_lrt[t]]
            elif mode == 3:
                vals += [p_score[t]]
            elif mode == 4:
                vals += [p_wald[t], p_lrt[t], p_score[t]]
            fh.write("\t".join(_fmt_sci6(float(v)) for v in vals) + "\n")


def write_lmm_gene_assoc(path: str, mode: int, gene_ids: list,
                         stats: dict) -> None:
    """Gene-expression assoc.txt variant (lmm.cpp:182-190)."""
    cols = _lmm_stat_columns(mode)
    with open(path, "w") as fh:
        fh.write("geneID\t")
        fh.write("\t".join(cols) + "\n")
        for i, gid in enumerate(gene_ids):
            fh.write(f"{gid}\t")
            fh.write("\t".join(_fmt_sci6(float(stats[c][i])) for c in cols))
            fh.write("\n")


# ---------------------------------------------------------------------------
# BSLMM outputs (bslmm.cpp:116-309)

def write_bslmm_hyp(path: str, hyp: np.ndarray) -> None:
    """prefix.hyp.txt: h pve rho pge pi n_gamma per recorded state."""
    with open(path, "w") as fh:
        fh.write("h \t pve \t rho \t pge \t pi \t n_gamma\n")
        for row in hyp:
            fh.write(f"{row[0]:.6e}\t{row[1]:.6e}\t{row[2]:.6e}\t"
                     f"{row[3]:.6e}\t{np.exp(row[4]):.6e}\t{int(row[5])}\t\n")


def write_bslmm_gamma(path: str, gamma: np.ndarray, s_max: int) -> None:
    """prefix.gamma.txt: per recorded state, 1-based positions of the
    active SNPs (0-padded to s_max)."""
    with open(path, "w") as fh:
        fh.write("".join(f"s{i}\t" for i in range(s_max)) + "\n")
        for row in gamma:
            fh.write("".join(f"{int(v)}\t" for v in row) + "\n")


def write_bslmm_param(path: str, snp_rows: list, alpha: np.ndarray,
                      beta_mean: np.ndarray, gamma_freq: np.ndarray) -> None:
    """prefix.param.txt: per-SNP posterior alpha/beta/gamma."""
    with open(path, "w") as fh:
        fh.write("chr\trs\tps\tn_miss\talpha\tbeta\tgamma\n")
        for t, s in enumerate(snp_rows):
            fh.write(f"{s['chr']}\t{s['rs']}\t{s['ps']}\t{s['n_miss']}\t")
            fh.write(f"{alpha[t]:.6e}\t{beta_mean[t]:.6e}\t"
                     f"{gamma_freq[t]:.6e}\n")


def write_bslmm_bv(path: str, bv: np.ndarray,
                   indicator_idv: np.ndarray) -> None:
    """prefix.bv.txt: breeding values, NA for excluded individuals."""
    with open(path, "w") as fh:
        t = 0
        for ind in indicator_idv:
            if not ind:
                fh.write("NA\n")
            else:
                fh.write(f"{bv[t]:.6e}\n")
                t += 1


def snp_rows_from_table(snps, qc, order: np.ndarray) -> list:
    """Build writer rows for the analyzed SNPs in output order."""
    rows = []
    for i in order:
        rows.append(dict(
            chr=snps.chr[i], rs=snps.rs[i], ps=snps.pos[i],
            n_miss=int(qc.n_miss[i]), allele1=snps.a_minor[i],
            allele0=snps.a_major[i], af=float(qc.maf[i])))
    return rows


def ensure_outdir(path_out: str) -> None:
    os.makedirs(path_out, exist_ok=True)
