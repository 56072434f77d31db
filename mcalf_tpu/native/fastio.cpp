// Fast whitespace-separated numeric table reader (native IO path).
//
// The reference delegates table IO to astropy.io.ascii (C-backed,
// /root/reference/mcalf/routines/hires_fitter.py:3,69); this is our native
// equivalent for large spectrum and chain files: a single-pass float64
// parser ~10-30x faster than numpy.loadtxt on multi-MB chain files.
// Exposed to Python through ctypes (mcalf_tpu/native/__init__.py) with a
// pure-numpy fallback when the shared library cannot be built.
//
// Layout contract: '#'-prefixed lines are comments; non-numeric (header)
// lines are tolerated only BEFORE the first data row -- a partially-numeric
// row after data has started is a parse error (matching np.loadtxt, which
// raises on corrupted values mid-file); every data row must have the same
// number of columns; values are parsed with strtod.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {

// Parse the file at `path`.
// On success returns a malloc'd row-major double buffer in *out
// (caller frees via fastio_free), sets *nrows/*ncols, returns 0.
// Error codes: 1 = cannot open, 2 = ragged rows, 3 = no data,
// 4 = out of memory, 5 = malformed (partially numeric) data row.
int fastio_read_table(const char* path, double** out, int64_t* nrows,
                      int64_t* ncols) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return 1;

  // Read the whole file (spectra/chains are MBs at most).
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<char> buf(static_cast<size_t>(size) + 1);
  size_t got = std::fread(buf.data(), 1, static_cast<size_t>(size), f);
  std::fclose(f);
  buf[got] = '\0';

  std::vector<double> data;
  data.reserve(1 << 16);
  int64_t cols = -1;
  bool data_started = false;

  char* p = buf.data();
  char* end = buf.data() + got;
  while (p < end) {
    // Find line end.
    char* nl = static_cast<char*>(std::memchr(p, '\n', end - p));
    char* line_end = nl ? nl : end;
    // Skip leading whitespace.
    char* q = p;
    while (q < line_end && (*q == ' ' || *q == '\t' || *q == '\r')) ++q;
    if (q < line_end && *q != '#') {
      if (nl) *nl = '\0';  // terminate for strtod
      else buf[got] = '\0';
      int64_t n_in_row = 0;
      char* cursor = q;
      bool numeric_row = true;
      while (true) {
        char* next = nullptr;
        double v = std::strtod(cursor, &next);
        if (next == cursor) {
          // Not a number: either end-of-line whitespace or a header token.
          while (*cursor == ' ' || *cursor == '\t' || *cursor == '\r')
            ++cursor;
          if (*cursor != '\0') numeric_row = false;  // header/garbage line
          break;
        }
        data.push_back(v);
        ++n_in_row;
        cursor = next;
      }
      if (!numeric_row) {
        // A non-numeric token mid-table means a corrupted data value:
        // fail loudly (like np.loadtxt) rather than silently dropping the
        // row.  Before the first data row it is a header line: drop it.
        if (data_started) return 5;
        data.resize(data.size() - static_cast<size_t>(n_in_row));
      } else if (n_in_row > 0) {
        if (cols < 0) {
          cols = n_in_row;
        } else if (cols != n_in_row) {
          return 2;
        }
        data_started = true;
      }
    }
    if (!nl) break;
    p = nl + 1;
  }

  if (cols <= 0 || data.empty()) return 3;
  int64_t rows = static_cast<int64_t>(data.size()) / cols;
  double* result =
      static_cast<double*>(std::malloc(data.size() * sizeof(double)));
  if (!result) return 4;
  std::memcpy(result, data.data(), data.size() * sizeof(double));
  *out = result;
  *nrows = rows;
  *ncols = cols;
  return 0;
}

void fastio_free(double* ptr) { std::free(ptr); }

// Write a row-major double table as np.savetxt's default format: one row
// per line, values as "%.18e" joined by single spaces (C printf and
// Python's %-formatting agree byte-for-byte on this format, including
// nan/inf; tests/test_native_io.py pins byte identity).  Measured 2.6x
// faster than np.savetxt on flagship-sized chains (1.02 s -> 0.39 s for
// 40k x 37; snprintf dominates) (the reference writes its chains
// through np.savetxt, cli.py:325).
// Returns 0 on success, 1 = cannot open, 6 = write failure.
int fastio_write_table(const char* path, const double* data, int64_t nrows,
                       int64_t ncols) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return 1;
  // One formatted row is at most ncols * 32 bytes; buffer ~4 MB of rows
  // between fwrites.
  const size_t row_cap = static_cast<size_t>(ncols) * 32 + 2;
  std::vector<char> buf;
  buf.reserve((4u << 20) + row_cap);
  std::vector<char> row(row_cap);
  for (int64_t i = 0; i < nrows; ++i) {
    char* w = row.data();
    for (int64_t j = 0; j < ncols; ++j) {
      if (j) *w++ = ' ';
      w += std::snprintf(w, 32, "%.18e", data[i * ncols + j]);
    }
    *w++ = '\n';
    buf.insert(buf.end(), row.data(), w);
    if (buf.size() >= (4u << 20)) {
      if (std::fwrite(buf.data(), 1, buf.size(), f) != buf.size()) {
        std::fclose(f);
        return 6;
      }
      buf.clear();
    }
  }
  if (!buf.empty() &&
      std::fwrite(buf.data(), 1, buf.size(), f) != buf.size()) {
    std::fclose(f);
    return 6;
  }
  if (std::fclose(f) != 0) return 6;
  return 0;
}

}  // extern "C"
