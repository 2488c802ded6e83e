"""ctypes bindings for the native (C++) data loader.

The library is built on demand from native/ (make) and loaded lazily;
all callers fall back to the pure-Python readers if the toolchain or
library is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_RS_LEN = 64
_ALLELE_LEN = 16

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libgemma_native.so")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(["make", "-C", _NATIVE_DIR],
                           capture_output=True, check=True, timeout=120)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.bimbam_count.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64)]
        lib.bimbam_count.restype = ctypes.c_int
        lib.bimbam_parse.argtypes = [
            ctypes.c_char_p,
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_int64, ctypes.c_int64]
        lib.bimbam_parse.restype = ctypes.c_int64
        lib.bimbam_open.argtypes = [ctypes.c_char_p]
        lib.bimbam_open.restype = ctypes.c_void_p
        lib.bimbam_close.argtypes = [ctypes.c_void_p]
        lib.bimbam_close.restype = None
        lib.bimbam_read_block.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_int64, ctypes.c_int64]
        lib.bimbam_read_block.restype = ctypes.c_int64
        lib.bimbam_parse_stats.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p,
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p]
        lib.bimbam_parse_stats.restype = ctypes.c_int64
        lib.bimbam_read_block_stats.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p]
        lib.bimbam_read_block_stats.restype = ctypes.c_int64
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def parse_bimbam(path: str, stat_mask: np.ndarray | None = None):
    """Parse a BIMBAM genotype file natively.

    Returns (rs list, a1 list, a0 list, X (p, n) float64 with NaN
    missing[, stats]) or None if the native library is unavailable.

    stat_mask (bool (n,)) fuses the per-SNP QC statistic scan into the
    tokenization pass over the masked (analyzed) columns; the extra
    return is a (p, 8) float64 array of [n_miss, sum, n_0, n_1, n_2,
    min, max, sumsq] per SNP (io/qc.py consumes it, replacing its own
    O(p·n) numpy sweep).
    """
    lib = _load()
    if lib is None:
        return None

    n_rows = ctypes.c_int64()
    n_cols = ctypes.c_int64()
    rc = lib.bimbam_count(path.encode(), ctypes.byref(n_rows),
                          ctypes.byref(n_cols))
    if rc != 0 or n_rows.value <= 0 or n_cols.value <= 0:
        return None

    p, n = n_rows.value, n_cols.value
    X = np.empty((p, n), dtype=np.float64)
    rs_buf = ctypes.create_string_buffer(p * _RS_LEN)
    a1_buf = ctypes.create_string_buffer(p * _ALLELE_LEN)
    a0_buf = ctypes.create_string_buffer(p * _ALLELE_LEN)

    stats = None
    if stat_mask is not None:
        if len(stat_mask) != n:
            raise ValueError(f"stat_mask has {len(stat_mask)} entries, "
                             f"file has {n} genotype columns")
        mask = np.ascontiguousarray(stat_mask, dtype=np.uint8)
        stats = np.empty((p, 8), dtype=np.float64)
        got = lib.bimbam_parse_stats(
            path.encode(), X.ctypes.data_as(ctypes.c_void_p), rs_buf,
            a1_buf, a0_buf, p, n, mask.ctypes.data_as(ctypes.c_void_p),
            stats.ctypes.data_as(ctypes.c_void_p))
    else:
        got = lib.bimbam_parse(path.encode(), X, rs_buf, a1_buf,
                               a0_buf, p, n)
    if got != p:
        return None

    def _fixed(buf, width, count):
        raw = np.frombuffer(buf, dtype=f"S{width}", count=count)
        return [s.split(b"\x00", 1)[0].decode() for s in raw]

    rs = _fixed(rs_buf, _RS_LEN, p)
    a1 = _fixed(a1_buf, _ALLELE_LEN, p)
    a0 = _fixed(a0_buf, _ALLELE_LEN, p)
    if stats is not None:
        return rs, a1, a0, X, stats
    return rs, a1, a0, X


class BimbamStream:
    """Incremental native reader over a (gzipped) BIMBAM file: read
    SNP rows in bounded blocks without materialising the matrix
    (gemma_io.cpp:1418-1597 streaming posture).  None-able: callers
    must check `native.available()` first."""

    def __init__(self, path: str, n_cols: int):
        self._lib = _load()
        self._h = self._lib.bimbam_open(path.encode())
        if not self._h:
            raise IOError(f"cannot open {path}")
        self.n_cols = n_cols
        self.row = 0               # next file row the stream will yield

    def read_block(self, max_rows: int, metadata_only: bool = False,
                   stat_mask: np.ndarray | None = None):
        """Returns (X or None, rs, a1, a0[, stats]) with ≤ max_rows
        rows; empty arrays at EOF.  stat_mask fuses the per-SNP QC
        statistic scan (see parse_bimbam) and appends a (rows, 8)
        stats array to the tuple."""
        lib = self._lib
        rs_buf = ctypes.create_string_buffer(max_rows * _RS_LEN)
        a1_buf = ctypes.create_string_buffer(max_rows * _ALLELE_LEN)
        a0_buf = ctypes.create_string_buffer(max_rows * _ALLELE_LEN)
        stats = None
        if stat_mask is not None:
            mask = np.ascontiguousarray(stat_mask, dtype=np.uint8)
            stats = np.empty((max_rows, 8), dtype=np.float64)
            X = (None if metadata_only
                 else np.empty((max_rows, self.n_cols), dtype=np.float64))
            got = lib.bimbam_read_block_stats(
                self._h,
                None if X is None else X.ctypes.data_as(ctypes.c_void_p),
                rs_buf, a1_buf, a0_buf, max_rows, self.n_cols,
                mask.ctypes.data_as(ctypes.c_void_p),
                stats.ctypes.data_as(ctypes.c_void_p))
            if X is not None:
                X = X[:got]
            stats = stats[:got]
        elif metadata_only:
            got = lib.bimbam_read_block(self._h, None, rs_buf, a1_buf,
                                        a0_buf, max_rows, self.n_cols)
            X = None
        else:
            X = np.empty((max_rows, self.n_cols), dtype=np.float64)
            got = lib.bimbam_read_block(
                self._h, X.ctypes.data_as(ctypes.c_void_p), rs_buf,
                a1_buf, a0_buf, max_rows, self.n_cols)
            X = X[:got]
        self.row += got

        def _fixed(buf, width):
            raw = np.frombuffer(buf, dtype=f"S{width}", count=got)
            return [s.split(b"\x00", 1)[0].decode() for s in raw]

        out = (X, _fixed(rs_buf, _RS_LEN), _fixed(a1_buf, _ALLELE_LEN),
               _fixed(a0_buf, _ALLELE_LEN))
        return out + (stats,) if stats is not None else out

    def close(self):
        if self._h:
            self._lib.bimbam_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def bimbam_dims(path: str):
    """(n_rows, n_cols) via the native counting pass, or None."""
    lib = _load()
    if lib is None:
        return None
    n_rows = ctypes.c_int64()
    n_cols = ctypes.c_int64()
    if lib.bimbam_count(path.encode(), ctypes.byref(n_rows),
                        ctypes.byref(n_cols)) != 0:
        return None
    return n_rows.value, n_cols.value


def f64_to_i8_hardcalls(X: np.ndarray) -> np.ndarray | None:
    """One-pass hard-call encoding of a float64 dosage matrix
    ({0,1,2} -> int8, NaN -> -1); None when any value is outside the
    set (fractional dosages) or the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    if not hasattr(lib, "_i8_ready"):
        lib.f64_to_i8_hardcalls.argtypes = [
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            ctypes.c_int64, ctypes.c_void_p]
        lib.f64_to_i8_hardcalls.restype = ctypes.c_int64
        lib._i8_ready = True
    X = np.ascontiguousarray(X, dtype=np.float64)
    out = np.empty(X.shape, dtype=np.int8)
    rc = lib.f64_to_i8_hardcalls(X.reshape(-1), X.size,
                                 out.ctypes.data_as(ctypes.c_void_p))
    return out if rc == 0 else None


def fmt_g10(v: float) -> str | None:
    """Test hook: the fast %.10g formatter for one double, or None
    when it defers to snprintf."""
    lib = _load()
    if lib is None:
        return None
    if not hasattr(lib, "_fmt_ready"):
        lib.fmt_g10_test.argtypes = [ctypes.c_double, ctypes.c_char_p]
        lib.fmt_g10_test.restype = ctypes.c_int
        lib._fmt_ready = True
    buf = ctypes.create_string_buffer(64)
    n = lib.fmt_g10_test(float(v), buf)
    if n < 0:
        return None
    return buf.raw[:n].decode()


def write_matrix_g10(path: str, M) -> bool:
    """Native %.10g tab-separated matrix writer; False if the library
    is unavailable (caller falls back to numpy)."""
    lib = _load()
    if lib is None:
        return False
    if not hasattr(lib, "_wm_ready"):
        lib.write_matrix_g10.argtypes = [
            ctypes.c_char_p,
            np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS"),
            ctypes.c_int64, ctypes.c_int64]
        lib.write_matrix_g10.restype = ctypes.c_int
        lib._wm_ready = True
    M = np.ascontiguousarray(M, dtype=np.float64)
    rows, cols = (M.shape[0], M.shape[1]) if M.ndim == 2 else (1, M.shape[0])
    return lib.write_matrix_g10(path.encode(), M.reshape(rows, cols),
                                rows, cols) == 0


def write_matrix_g10_rows(path: str, M, append: bool) -> bool:
    """Append (or start) a row chunk of a %.10g matrix file; False if
    the native library is unavailable (caller falls back to Python
    formatting, which stays byte-identical)."""
    lib = _load()
    if lib is None:
        return False
    if not hasattr(lib, "_wmr_ready"):
        lib.write_matrix_g10_rows.argtypes = [
            ctypes.c_char_p,
            np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS"),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int]
        lib.write_matrix_g10_rows.restype = ctypes.c_int
        lib._wmr_ready = True
    M = np.ascontiguousarray(M, dtype=np.float64)
    rows, cols = (M.shape[0], M.shape[1]) if M.ndim == 2 else (1, M.shape[0])
    return lib.write_matrix_g10_rows(path.encode(), M.reshape(rows, cols),
                                     rows, cols, 1 if append else 0) == 0
