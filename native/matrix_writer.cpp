// Native tab-separated matrix writer with C++ default-notation
// precision(10) formatting — byte-identical to the reference's
// WriteMatrix (param.cpp:1820-1890, outfile.precision(10)) and to
// printf "%.10g".  Writing the n x n kinship as text dominates -gk
// wall time at n >= 10k; snprintf + a large stdio buffer is ~5x the
// Python formatter.
//
// C ABI (ctypes):
//   write_matrix_g10(path, data, rows, cols) -> 0 on success
//   write_matrix_g10_rows(path, data, rows, cols, append) -> 0 on
//     success; append != 0 opens in "a" mode so a symmetric matrix can
//     be written in row chunks as they stream off the device (the
//     axon device->host link runs at 1-4 MB/s, so overlapping the
//     transfer with text formatting hides most of the write cost).

#include <cmath>
#include <cstdio>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// ---- fast %.10g -----------------------------------------------------------
//
// snprintf("%.10g") costs ~450 ns/value on this host — 1.7 s for a
// 1940x1940 kinship, the dominant term of a warm -gk readback.  This
// emits the identical bytes ~6x faster: the 10 significant decimal
// digits come from one 80-bit long-double scaling (64-bit mantissa =
// ~1e-19 relative error, >1e8 times finer than the digit-10 rounding
// boundary), and any value whose scaled fraction lands within 1e-8 of
// the round-half boundary falls back to snprintf, so ambiguous
// roundings (including the exact-half round-to-even cases, which are
// confined to |v| >= 1e10 integers) are never decided by the fast
// path.  Byte-identity with glibc is regression-tested across random
// and structured samples (tests/test_native.py).

long double ld_p10[701];  // 10^(k-350), k = 0..700
bool p10_ready = false;

void init_p10() {
    for (int k = 0; k < 701; k++) ld_p10[k] = powl(10.0L, k - 350);
    p10_ready = true;
}

// Format v as printf %.10g into out; returns length, or -1 to request
// the snprintf fallback.
inline int fmt_g10(double v, char *out) {
    char *o = out;
    if (std::isnan(v)) { std::memcpy(o, "nan", 3); return 3; }
    if (std::signbit(v)) { *o++ = '-'; v = -v; }
    if (v == 0.0) { *o++ = '0'; return (int)(o - out); }
    if (std::isinf(v)) { std::memcpy(o, "inf", 3); return (int)(o - out) + 3; }

    long double av = v;
    int e10 = (int)floorl(log10l(av));
    for (int tries = 0; tries < 4; tries++) {
        int idx = 9 - e10 + 350;
        if (idx < 0 || idx > 700) return -1;
        long double scaled = av * ld_p10[idx];
        if (scaled >= 1e10L) { e10++; continue; }
        if (scaled < 1e9L) { e10--; continue; }
        long double fl = floorl(scaled);
        long double frac = scaled - fl;
        if (fabsl(frac - 0.5L) < 1e-8L) return -1;   // ambiguous rounding
        uint64_t D = (uint64_t)fl + (frac > 0.5L ? 1 : 0);
        if (D >= 10000000000ULL) { e10++; continue; }
        if (D < 1000000000ULL) { e10--; continue; }

        char dig[10];
        uint64_t t = D;
        for (int i = 9; i >= 0; i--) { dig[i] = (char)('0' + t % 10); t /= 10; }
        int k = 10;
        while (k > 1 && dig[k - 1] == '0') k--;
        int X = e10;
        if (X >= -4 && X < 10) {          // %f style
            if (X >= k - 1) {
                for (int i = 0; i < k; i++) *o++ = dig[i];
                for (int i = k; i <= X; i++) *o++ = '0';
            } else if (X >= 0) {
                for (int i = 0; i <= X; i++) *o++ = dig[i];
                *o++ = '.';
                for (int i = X + 1; i < k; i++) *o++ = dig[i];
            } else {
                *o++ = '0'; *o++ = '.';
                for (int i = 0; i < -X - 1; i++) *o++ = '0';
                for (int i = 0; i < k; i++) *o++ = dig[i];
            }
        } else {                          // %e style
            *o++ = dig[0];
            if (k > 1) {
                *o++ = '.';
                for (int i = 1; i < k; i++) *o++ = dig[i];
            }
            *o++ = 'e';
            *o++ = X < 0 ? '-' : '+';
            int ax = X < 0 ? -X : X;
            char eb[8];
            int el = 0;
            do { eb[el++] = (char)('0' + ax % 10); ax /= 10; } while (ax);
            if (el < 2) *o++ = '0';
            while (el) *o++ = eb[--el];
        }
        return (int)(o - out);
    }
    return -1;
}

int write_rows(FILE *fh, const double *data, int64_t rows,
               int64_t cols) {
    if (!p10_ready) init_p10();
    std::vector<char> iobuf(1 << 22);
    std::setvbuf(fh, iobuf.data(), _IOFBF, iobuf.size());
    char buf[64];
    for (int64_t i = 0; i < rows; i++) {
        const double *row = data + i * cols;
        for (int64_t j = 0; j < cols; j++) {
            int len = fmt_g10(row[j], buf);
            if (len < 0)
                len = std::snprintf(buf, sizeof buf, "%.10g", row[j]);
            if (j) std::fputc('\t', fh);
            std::fwrite(buf, 1, len, fh);
        }
        std::fputc('\n', fh);
    }
    return std::fclose(fh);
}

}  // namespace

extern "C" {

int write_matrix_g10(const char *path, const double *data,
                     int64_t rows, int64_t cols) {
    FILE *fh = std::fopen(path, "w");
    if (!fh) return 1;
    return write_rows(fh, data, rows, cols);
}

int write_matrix_g10_rows(const char *path, const double *data,
                          int64_t rows, int64_t cols, int append) {
    FILE *fh = std::fopen(path, append ? "a" : "w");
    if (!fh) return 1;
    return write_rows(fh, data, rows, cols);
}

// Test hook: format one double as %.10g via the fast path; returns
// the length, or -1 when the fast path would defer to snprintf.
int fmt_g10_test(double v, char *out) {
    if (!p10_ready) init_p10();
    return fmt_g10(v, out);
}

// One-pass float64 -> int8 hard-call conversion ({0,1,2}, NaN -> -1):
// the genotype-sidecar encoder (io/bimbam.py _as_i8) without numpy's
// four full-matrix float64 sweeps.  Returns 0 on success, or 1-based
// index of the first value outside the hard-call set (caller stores
// float64 instead).
int64_t f64_to_i8_hardcalls(const double *x, int64_t size, int8_t *out) {
    for (int64_t i = 0; i < size; i++) {
        double v = x[i];
        if (v == 0.0) out[i] = 0;
        else if (v == 1.0) out[i] = 1;
        else if (v == 2.0) out[i] = 2;
        else if (v != v) out[i] = -1;
        else return i + 1;
    }
    return 0;
}

}  // extern "C"
