// Native CSV ingest for the CTR data layer.
//
// The counterpart of the reference's row-by-row Python CSV readers
// (utils/data_preprocess.py:54-117): parses a label + numeric + categorical
// CSV straight into caller-allocated dense arrays (float32 label/value,
// int32 index) with no Python-object churn. Memory-maps the file, splits it
// into newline-aligned chunks, and parses chunks in parallel.
//
// All cells are parsed as float (the ali/avazu dumps store categorical
// indices as "1.0"-style floats, reference :75-117); index cells are then
// truncated to int32. Rows whose first cell is not numeric (e.g. the "y2"
// header the reference skips at :73) are dropped — by the SAME criterion in
// the count and load passes, so counts always agree.
//
// C API (ctypes-friendly):
//   csv_count_rows(path)                  -> number of valid rows, or -1
//   csv_load(path, col_role, n_cols, ...) -> rows written, or -1
// col_role: per-column 0=label, 1=value, 2=index; value/index columns fill
// their output rows in column order (matching the Python readers, which take
// sorted numeric positions and ascending categorical positions).

#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct MappedFile {
  const char* data = nullptr;
  size_t size = 0;
  int fd = -1;

  bool open(const char* path) {
    fd = ::open(path, O_RDONLY);
    if (fd < 0) return false;
    struct stat st;
    if (fstat(fd, &st) != 0 || st.st_size == 0) return false;
    size = static_cast<size_t>(st.st_size);
    void* p = mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0);
    if (p == MAP_FAILED) return false;
    madvise(p, size, MADV_SEQUENTIAL);
    data = static_cast<const char*>(p);
    return true;
  }
  ~MappedFile() {
    if (data) munmap(const_cast<char*>(data), size);
    if (fd >= 0) close(fd);
  }
};

inline bool line_is_valid(const char* p, const char* end) {
  // valid := first cell parses as a number (skips headers like "y2,...")
  while (p < end && (*p == ' ' || *p == '\t')) ++p;
  if (p >= end) return false;
  if (*p == '-' || *p == '+') ++p;
  return p < end && (std::isdigit(static_cast<unsigned char>(*p)) || *p == '.');
}

// Newline-aligned [begin, end) chunks covering the whole file.
std::vector<std::pair<const char*, const char*>> split_chunks(
    const char* data, size_t size, unsigned n) {
  std::vector<std::pair<const char*, const char*>> chunks;
  const char* end = data + size;
  const char* pos = data;
  for (unsigned i = 0; i < n && pos < end; ++i) {
    const char* target = (i + 1 == n) ? end : data + size * (i + 1) / n;
    if (target < end) {
      const char* nl = static_cast<const char*>(
          memchr(target, '\n', static_cast<size_t>(end - target)));
      target = nl ? nl + 1 : end;
    }
    chunks.emplace_back(pos, target);
    pos = target;
  }
  return chunks;
}

int64_t count_valid_rows(const char* begin, const char* end) {
  int64_t rows = 0;
  const char* p = begin;
  while (p < end) {
    const char* nl = static_cast<const char*>(
        memchr(p, '\n', static_cast<size_t>(end - p)));
    const char* line_end = nl ? nl : end;
    if (line_is_valid(p, line_end)) ++rows;
    p = nl ? nl + 1 : end;
  }
  return rows;
}

// One parsed cell. Integer cells keep their exact int64 value so categorical
// indices above 2^24 are never routed through float32 (which silently rounds:
// 16777217 -> 16777216). Fractional / exponent cells carry only the float.
struct Cell {
  float f = 0.0f;
  int64_t i = 0;
  bool exact_int = false;  // `i` holds the exact value
  bool ok = false;         // the cell parsed as a number at all
};

// Parse one cell in [p, end). Fast path: plain (signed) integers — the
// dominant cell type in index-mapped CTR dumps; anything else (floats,
// exponents) falls back to strtof on a bounded copy (never reads past `end`,
// which matters for the last line of a page-aligned mmap).
inline Cell parse_cell(const char* p, const char* end, const char** after) {
  Cell out;
  const char* s = p;
  bool neg = false;
  if (s < end && (*s == '-' || *s == '+')) { neg = (*s == '-'); ++s; }
  int64_t v = 0;
  const char* d = s;
  while (d < end && *d >= '0' && *d <= '9' && d - s < 18) v = v * 10 + (*d++ - '0');
  if (d > s && (d == end || *d == ',' || *d == '\r' || *d == ' ')) {
    *after = d;
    out.i = neg ? -v : v;
    out.f = static_cast<float>(out.i);
    out.exact_int = true;
    out.ok = true;
    return out;
  }
  char buf[64];
  size_t len = std::min<size_t>(static_cast<size_t>(end - p), sizeof(buf) - 1);
  memcpy(buf, p, len);
  buf[len] = '\0';
  char* e = nullptr;
  float f = strtof(buf, &e);
  if (e == buf) { *after = p; return out; }  // ok=false: unparseable cell
  *after = p + (e - buf);
  out.f = f;
  out.i = static_cast<int64_t>(f);
  out.ok = true;
  return out;
}

// Parse one chunk, writing rows starting at row_offset. Returns rows written.
// `bad_out` counts malformed data: unparseable cells, short/ragged rows, and
// integer index cells outside int32 range — the Python layer raises and falls
// back to the (strict) numpy reader when any are seen, instead of silently
// zero-filling corrupt input.
int64_t parse_chunk(const char* begin, const char* end, int64_t row_offset,
                    const int32_t* col_role, int32_t n_cols, int32_t n_value,
                    int32_t n_index, float* label_out, float* value_out,
                    int32_t* index_out, int64_t max_rows, int64_t* bad_out) {
  int64_t row = row_offset;
  int64_t bad = 0;
  const char* p = begin;
  while (p < end && row < max_rows) {
    const char* nl = static_cast<const char*>(
        memchr(p, '\n', static_cast<size_t>(end - p)));
    const char* line_end = nl ? nl : end;
    if (line_is_valid(p, line_end)) {
      float* vrow = value_out + row * n_value;
      int32_t* irow = index_out + row * n_index;
      int32_t vi = 0, ii = 0, cells_seen = 0;
      const char* cell = p;
      for (int32_t c = 0; c < n_cols && cell < line_end; ++c) {
        const char* after = nullptr;
        Cell v = parse_cell(cell, line_end, &after);
        if (!v.ok) ++bad;
        ++cells_seen;
        switch (col_role[c]) {
          case 0:
            label_out[row] = v.f;
            break;
          case 1:
            if (vi < n_value) vrow[vi++] = v.f;
            break;
          default:
            if (ii < n_index) {
              // exact integer path: no float32 rounding above 2^24
              int64_t idx = v.exact_int ? v.i : static_cast<int64_t>(v.f);
              if (idx < INT32_MIN || idx > INT32_MAX) ++bad;
              irow[ii++] = static_cast<int32_t>(idx);
            }
            break;
        }
        const char* comma = static_cast<const char*>(
            memchr(cell, ',', static_cast<size_t>(line_end - cell)));
        cell = comma ? comma + 1 : line_end;
      }
      if (cells_seen < n_cols) ++bad;  // short/ragged row
      while (vi < n_value) vrow[vi++] = 0.0f;
      while (ii < n_index) irow[ii++] = 0;
      ++row;
    }
    p = nl ? nl + 1 : end;
  }
  *bad_out = bad;
  return row - row_offset;
}

}  // namespace

extern "C" {

int64_t csv_count_rows(const char* path) {
  MappedFile f;
  if (!f.open(path)) return -1;
  unsigned n = std::max(1u, std::thread::hardware_concurrency());
  auto chunks = split_chunks(f.data, f.size, n);
  std::vector<int64_t> counts(chunks.size(), 0);
  std::vector<std::thread> threads;
  for (size_t i = 0; i < chunks.size(); ++i)
    threads.emplace_back([&, i] {
      counts[i] = count_valid_rows(chunks[i].first, chunks[i].second);
    });
  for (auto& t : threads) t.join();
  int64_t total = 0;
  for (int64_t c : counts) total += c;
  return total;
}

// Returns rows written (<= max_rows) or -1 on error. `n_bad_out` (nullable)
// receives the count of malformed cells / short rows / out-of-range indices;
// callers should treat n_bad > 0 as a parse failure.
int64_t csv_load_v2(const char* path, const int32_t* col_role, int32_t n_cols,
                    float* label_out, float* value_out, int32_t* index_out,
                    int64_t max_rows, int64_t* n_bad_out) {
  if (n_cols <= 0 || max_rows < 0) return -1;
  MappedFile f;
  if (!f.open(path)) return -1;
  int32_t n_value = 0, n_index = 0;
  for (int32_t c = 0; c < n_cols; ++c) {
    if (col_role[c] == 1) ++n_value;
    else if (col_role[c] == 2) ++n_index;
  }
  if (n_value == 0 && n_index == 0) return -1;

  unsigned n = std::max(1u, std::thread::hardware_concurrency());
  auto chunks = split_chunks(f.data, f.size, n);
  // per-chunk row counts -> starting row offsets (so chunks parse in parallel)
  std::vector<int64_t> counts(chunks.size(), 0);
  {
    std::vector<std::thread> threads;
    for (size_t i = 0; i < chunks.size(); ++i)
      threads.emplace_back([&, i] {
        counts[i] = count_valid_rows(chunks[i].first, chunks[i].second);
      });
    for (auto& t : threads) t.join();
  }
  std::vector<int64_t> offsets(chunks.size(), 0);
  int64_t acc = 0;
  for (size_t i = 0; i < chunks.size(); ++i) { offsets[i] = acc; acc += counts[i]; }

  std::vector<int64_t> written(chunks.size(), 0);
  std::vector<int64_t> bad(chunks.size(), 0);
  std::vector<std::thread> threads;
  for (size_t i = 0; i < chunks.size(); ++i)
    threads.emplace_back([&, i] {
      written[i] = parse_chunk(chunks[i].first, chunks[i].second, offsets[i],
                               col_role, n_cols, n_value, n_index, label_out,
                               value_out, index_out, max_rows, &bad[i]);
    });
  for (auto& t : threads) t.join();
  int64_t total = 0, total_bad = 0;
  for (int64_t w : written) total += w;
  for (int64_t b : bad) total_bad += b;
  if (n_bad_out) *n_bad_out = total_bad;
  return total;
}

// Backwards-compatible entry point (no malformed-data reporting).
int64_t csv_load(const char* path, const int32_t* col_role, int32_t n_cols,
                 float* label_out, float* value_out, int32_t* index_out,
                 int64_t max_rows) {
  return csv_load_v2(path, col_role, n_cols, label_out, value_out, index_out,
                     max_rows, nullptr);
}

}  // extern "C"
