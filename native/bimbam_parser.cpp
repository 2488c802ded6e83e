// Native BIMBAM mean-genotype parser.
//
// The reference spends ~30% of kinship wall time in text tokenization
// (doc/developers/profiling.md: strtod + ReadFile_geno); a Python
// parser is far worse.  This library streams the (optionally gzipped)
// file once to count rows, then parses dosages straight into a
// caller-provided float64 buffer with NaN for "NA".
//
// Exposed via a C ABI for ctypes (no pybind11 dependency):
//   bimbam_count(path, &n_rows, &n_cols)    -> 0 on success
//   bimbam_parse(path, data, rs, a1, a0, n_rows, n_cols) -> rows parsed
//
// rs/a1/a0 are caller buffers of n_rows * {RS_LEN, ALLELE_LEN} bytes,
// zero-padded fixed-width records.

#include <zlib.h>

#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

constexpr int RS_LEN = 64;
constexpr int ALLELE_LEN = 16;
constexpr size_t CHUNK = 1 << 20;

// Streaming line reader over a gz file (zlib transparently handles
// plain files too).
class GzLines {
 public:
  explicit GzLines(const char* path) : f_(gzopen(path, "rb")) {
    gzbuffer(f_, 1 << 20);
  }
  ~GzLines() {
    if (f_) gzclose(f_);
  }
  bool ok() const { return f_ != nullptr; }

  // Returns false at EOF.  The line (without trailing newline) is
  // placed in `line`.
  bool next(std::string* line) {
    line->clear();
    while (true) {
      if (pos_ >= len_) {
        len_ = gzread(f_, buf_, CHUNK);
        pos_ = 0;
        if (len_ <= 0) return !line->empty();
      }
      char* nl = static_cast<char*>(
          memchr(buf_ + pos_, '\n', len_ - pos_));
      if (nl) {
        line->append(buf_ + pos_, nl - (buf_ + pos_));
        pos_ = (nl - buf_) + 1;
        if (!line->empty() && line->back() == '\r') line->pop_back();
        return true;
      }
      line->append(buf_ + pos_, len_ - pos_);
      pos_ = len_;
    }
  }

 private:
  gzFile f_ = nullptr;
  char buf_[CHUNK];
  int pos_ = 0;
  int len_ = 0;
};

inline const char* skip_seps(const char* p) {
  while (*p == ' ' || *p == ',' || *p == '\t') ++p;
  return p;
}

inline const char* next_token(const char* p, const char** tok_end) {
  p = skip_seps(p);
  const char* e = p;
  while (*e && *e != ' ' && *e != ',' && *e != '\t') ++e;
  *tok_end = e;
  return p;
}

// Parse one SNP line: metadata into rs/a1/a0 (fixed-width records at
// index r) and, when data != nullptr, dosages into data (NaN for NA).
inline void parse_row(const std::string& line, double* data, char* rs,
                      char* a1, char* a0, int64_t r, int64_t n_cols) {
  const char* p = line.c_str();
  const char* e;

  p = next_token(p, &e);
  size_t len = std::min<size_t>(e - p, RS_LEN - 1);
  memcpy(rs + r * RS_LEN, p, len);
  memset(rs + r * RS_LEN + len, 0, RS_LEN - len);
  p = next_token(e, &e);
  len = std::min<size_t>(e - p, ALLELE_LEN - 1);
  memcpy(a1 + r * ALLELE_LEN, p, len);
  memset(a1 + r * ALLELE_LEN + len, 0, ALLELE_LEN - len);
  p = next_token(e, &e);
  len = std::min<size_t>(e - p, ALLELE_LEN - 1);
  memcpy(a0 + r * ALLELE_LEN, p, len);
  memset(a0 + r * ALLELE_LEN + len, 0, ALLELE_LEN - len);

  if (data == nullptr) return;
  const double nan_v = std::nan("");
  double* row = data + r * n_cols;
  int64_t c = 0;
  p = e;
  while (c < n_cols) {
    p = next_token(p, &e);
    if (p == e) break;
    if (p[0] == 'N' && p[1] == 'A') {
      row[c] = nan_v;
    } else {
      char* endp;
      row[c] = strtod(p, &endp);
    }
    ++c;
    p = e;
  }
  for (; c < n_cols; ++c) row[c] = nan_v;
}

}  // namespace

extern "C" {

// ---- streaming interface (bounded-memory ingestion; the two-pass
// streaming posture of ReadFile_geno/BimbamKin, gemma_io.cpp:639-873,
// 1418-1597, without ever holding the (p, n) matrix) ----

void* bimbam_open(const char* path) {
  GzLines* r = new GzLines(path);
  if (!r->ok()) {
    delete r;
    return nullptr;
  }
  return r;
}

void bimbam_close(void* handle) {
  delete static_cast<GzLines*>(handle);
}

// Read up to max_rows SNP rows.  data may be NULL for a metadata-only
// pass (dosage parsing skipped).  Returns rows read (0 at EOF).
int64_t bimbam_read_block(void* handle, double* data, char* rs, char* a1,
                          char* a0, int64_t max_rows, int64_t n_cols) {
  GzLines* reader = static_cast<GzLines*>(handle);
  std::string line;
  int64_t r = 0;
  while (r < max_rows && reader->next(&line)) {
    if (line.empty()) continue;
    parse_row(line, data, rs, a1, a0, r, n_cols);
    ++r;
  }
  return r;
}

// First pass: number of SNP rows and genotype columns.
int bimbam_count(const char* path, int64_t* n_rows, int64_t* n_cols) {
  GzLines reader(path);
  if (!reader.ok()) return -1;
  std::string line;
  int64_t rows = 0;
  int64_t cols = -1;
  while (reader.next(&line)) {
    if (line.empty()) continue;
    if (cols < 0) {
      // count tokens in the first line
      int64_t c = 0;
      const char* p = line.c_str();
      const char* e;
      while (*(p = next_token(p, &e)) != '\0') {
        ++c;
        p = e;
      }
      cols = c - 3;  // rs, allele1, allele0
      if (cols < 0) return -2;
    }
    ++rows;
  }
  *n_rows = rows;
  *n_cols = cols;
  return 0;
}

// Second pass: parse dosages (NaN for NA) and SNP metadata.
int64_t bimbam_parse(const char* path, double* data, char* rs, char* a1,
                     char* a0, int64_t n_rows, int64_t n_cols) {
  GzLines reader(path);
  if (!reader.ok()) return -1;
  std::string line;
  int64_t r = 0;
  while (r < n_rows && reader.next(&line)) {
    if (line.empty()) continue;
    parse_row(line, data, rs, a1, a0, r, n_cols);
    ++r;
  }
  return r;
}

}  // extern "C"
