// Native tab-separated matrix writer with C++ default-notation
// precision(10) formatting — byte-identical to the reference's
// WriteMatrix (param.cpp:1820-1890, outfile.precision(10)) and to
// printf "%.10g".  Writing the n x n kinship as text dominates -gk
// wall time at n >= 10k; snprintf + a large stdio buffer is ~5x the
// Python formatter.
//
// C ABI (ctypes):
//   write_matrix_g10(path, data, rows, cols) -> 0 on success

#include <cstdio>
#include <cstdint>
#include <vector>

extern "C" {

int write_matrix_g10(const char *path, const double *data,
                     int64_t rows, int64_t cols) {
    FILE *fh = std::fopen(path, "w");
    if (!fh) return 1;
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
    std::fclose(fh);
    return 0;
}

}  // extern "C"
