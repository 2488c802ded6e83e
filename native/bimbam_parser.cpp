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

// Fast decimal parser for dosage tokens ([+-]?digits[.digits]).
// strtod costs ~200 ns/token (locale machinery + arbitrary-precision
// correction loops) and dominated ingestion wall time; dosages are
// short fixed-point decimals, parsed here in ~15 ns.  Anything with
// an exponent / hex / >17 significant digits falls back to strtod
// (identical semantics, one extra rounding at most ~1 ulp on the fast
// path — far below the %.6e output precision).
inline double parse_dosage(const char* p, const char* e) {
  const char* q = p;
  bool neg = false;
  if (q < e && (*q == '-' || *q == '+')) {
    neg = (*q == '-');
    ++q;
  }
  uint64_t mant = 0;
  int nd = 0, fd = 0;
  while (q < e && (unsigned)(*q - '0') <= 9u) {
    mant = mant * 10 + (*q - '0');
    ++q;
    ++nd;
  }
  if (q < e && *q == '.') {
    ++q;
    while (q < e && (unsigned)(*q - '0') <= 9u) {
      mant = mant * 10 + (*q - '0');
      ++q;
      ++nd;
      ++fd;
    }
  }
  if (q != e || nd == 0 || nd > 17) {
    char* endp;
    return strtod(p, &endp);
  }
  static const double kPow10[18] = {
      1e0, 1e1, 1e2, 1e3, 1e4, 1e5, 1e6, 1e7, 1e8, 1e9, 1e10, 1e11,
      1e12, 1e13, 1e14, 1e15, 1e16, 1e17};
  double v = static_cast<double>(mant) / kPow10[fd];
  return neg ? -v : v;
}

// Per-row QC statistics over the masked (analyzed) columns, matching
// the reference's first-pass genotype scan (gemma_io.cpp:639-873:
// n_miss, dosage sum; genotype-class bins n_0 [0,0.5], n_1 (0.5,1.5),
// n_2 [1.5,2] at :767-775; min/max for the BIMBAM polymorphism rule
// :782-821).  Doubles throughout so one (n_rows, 8) array crosses the
// ctypes boundary.
struct RowStats {
  double n_miss, sum, n0, n1, n2, vmin, vmax, sumsq;
};

// Parse one SNP line: metadata into rs/a1/a0 (fixed-width records at
// index r) and, when data != nullptr, dosages into data (NaN for NA).
// mask/stats != nullptr additionally accumulates RowStats over
// columns with mask[c] != 0 in the same pass (QC fused into
// tokenization — no second O(p·n) sweep).
inline void parse_row(const std::string& line, double* data, char* rs,
                      char* a1, char* a0, int64_t r, int64_t n_cols,
                      const uint8_t* mask = nullptr,
                      double* stats = nullptr) {
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

  if (data == nullptr && stats == nullptr) return;
  const double nan_v = std::nan("");
  double* row = data ? data + r * n_cols : nullptr;
  RowStats st = {0, 0, 0, 0, 0, HUGE_VAL, -HUGE_VAL, 0};
  int64_t c = 0;
  p = e;
  while (c < n_cols) {
    p = next_token(p, &e);
    if (p == e) break;
    double v;
    bool is_na = (p[0] == 'N' && p[1] == 'A');
    v = is_na ? nan_v : parse_dosage(p, e);
    if (row) row[c] = v;
    if (stats && (mask == nullptr || mask[c])) {
      if (is_na || v != v) {
        st.n_miss += 1.0;
      } else {
        st.sum += v;
        st.sumsq += v * v;
        if (v >= 0.0 && v <= 0.5) st.n0 += 1.0;
        else if (v > 0.5 && v < 1.5) st.n1 += 1.0;
        else if (v >= 1.5 && v <= 2.0) st.n2 += 1.0;
        if (v < st.vmin) st.vmin = v;
        if (v > st.vmax) st.vmax = v;
      }
    }
    ++c;
    p = e;
  }
  for (; c < n_cols; ++c) {
    if (row) row[c] = nan_v;
    if (stats && (mask == nullptr || mask[c])) st.n_miss += 1.0;
  }
  if (stats) memcpy(stats + r * 8, &st, sizeof(RowStats));
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

// Parse + fused per-row QC statistics over masked columns: stats is a
// caller (n_rows, 8) float64 buffer receiving
// [n_miss, sum, n_0, n_1, n_2, min, max, sumsq] per row; mask is a
// uint8[n_cols] analyzed-individual indicator (NULL = all columns).
// One pass replaces the separate O(p·n) numpy QC sweep.
int64_t bimbam_parse_stats(const char* path, double* data, char* rs,
                           char* a1, char* a0, int64_t n_rows,
                           int64_t n_cols, const uint8_t* mask,
                           double* stats) {
  GzLines reader(path);
  if (!reader.ok()) return -1;
  std::string line;
  int64_t r = 0;
  while (r < n_rows && reader.next(&line)) {
    if (line.empty()) continue;
    parse_row(line, data, rs, a1, a0, r, n_cols, mask, stats);
    ++r;
  }
  return r;
}

// Streaming variant with fused stats (see bimbam_parse_stats).
int64_t bimbam_read_block_stats(void* handle, double* data, char* rs,
                                char* a1, char* a0, int64_t max_rows,
                                int64_t n_cols, const uint8_t* mask,
                                double* stats) {
  GzLines* reader = static_cast<GzLines*>(handle);
  std::string line;
  int64_t r = 0;
  while (r < max_rows && reader->next(&line)) {
    if (line.empty()) continue;
    parse_row(line, data, rs, a1, a0, r, n_cols, mask, stats);
    ++r;
  }
  return r;
}

}  // extern "C"
