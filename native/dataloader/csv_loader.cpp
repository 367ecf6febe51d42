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

// Parse one cell in [p, end). Fast path: plain (signed) integers — the
// dominant cell type in index-mapped CTR dumps; anything else (floats,
// exponents) falls back to strtof on a bounded copy (never reads past `end`,
// which matters for the last line of a page-aligned mmap).
inline float parse_cell(const char* p, const char* end, const char** after) {
  const char* s = p;
  bool neg = false;
  if (s < end && (*s == '-' || *s == '+')) { neg = (*s == '-'); ++s; }
  int64_t v = 0;
  const char* d = s;
  while (d < end && *d >= '0' && *d <= '9' && d - s < 18) v = v * 10 + (*d++ - '0');
  if (d > s && (d == end || *d == ',' || *d == '\r' || *d == ' ')) {
    *after = d;
    return neg ? -static_cast<float>(v) : static_cast<float>(v);
  }
  char buf[64];
  size_t len = std::min<size_t>(static_cast<size_t>(end - p), sizeof(buf) - 1);
  memcpy(buf, p, len);
  buf[len] = '\0';
  char* e = nullptr;
  float f = strtof(buf, &e);
  if (e == buf) { *after = p; return 0.0f; }
  *after = p + (e - buf);
  return f;
}

// Parse one chunk, writing rows starting at row_offset. Returns rows written.
int64_t parse_chunk(const char* begin, const char* end, int64_t row_offset,
                    const int32_t* col_role, int32_t n_cols, int32_t n_value,
                    int32_t n_index, float* label_out, float* value_out,
                    int32_t* index_out, int64_t max_rows) {
  int64_t row = row_offset;
  const char* p = begin;
  while (p < end && row < max_rows) {
    const char* nl = static_cast<const char*>(
        memchr(p, '\n', static_cast<size_t>(end - p)));
    const char* line_end = nl ? nl : end;
    if (line_is_valid(p, line_end)) {
      float* vrow = value_out + row * n_value;
      int32_t* irow = index_out + row * n_index;
      int32_t vi = 0, ii = 0;
      const char* cell = p;
      for (int32_t c = 0; c < n_cols && cell < line_end; ++c) {
        const char* after = nullptr;
        float v = parse_cell(cell, line_end, &after);
        switch (col_role[c]) {
          case 0: label_out[row] = v; break;
          case 1: if (vi < n_value) vrow[vi++] = v; break;
          default: if (ii < n_index) irow[ii++] = static_cast<int32_t>(v); break;
        }
        const char* comma = static_cast<const char*>(
            memchr(cell, ',', static_cast<size_t>(line_end - cell)));
        cell = comma ? comma + 1 : line_end;
      }
      while (vi < n_value) vrow[vi++] = 0.0f;
      while (ii < n_index) irow[ii++] = 0;
      ++row;
    }
    p = nl ? nl + 1 : end;
  }
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

// Returns rows written (<= max_rows) or -1 on error.
int64_t csv_load(const char* path, const int32_t* col_role, int32_t n_cols,
                 float* label_out, float* value_out, int32_t* index_out,
                 int64_t max_rows) {
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
  std::vector<std::thread> threads;
  for (size_t i = 0; i < chunks.size(); ++i)
    threads.emplace_back([&, i] {
      written[i] = parse_chunk(chunks[i].first, chunks[i].second, offsets[i],
                               col_role, n_cols, n_value, n_index, label_out,
                               value_out, index_out, max_rows);
    });
  for (auto& t : threads) t.join();
  int64_t total = 0;
  for (int64_t w : written) total += w;
  return total;
}

}  // extern "C"
