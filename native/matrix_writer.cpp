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

#include <cstdio>
#include <cstdint>
#include <vector>

namespace {

int write_rows(FILE *fh, const double *data, int64_t rows,
               int64_t cols) {
    std::vector<char> iobuf(1 << 22);
    std::setvbuf(fh, iobuf.data(), _IOFBF, iobuf.size());
    char buf[64];
    for (int64_t i = 0; i < rows; i++) {
        const double *row = data + i * cols;
        for (int64_t j = 0; j < cols; j++) {
            int len = std::snprintf(buf, sizeof buf, "%.10g", row[j]);
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

}  // extern "C"
