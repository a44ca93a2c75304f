// Native checkpoint/table I/O core (the runtime analog of the
// reference's C I/O layer: read_atoms chunked parsing, imd_io_3d.c:44;
// write_config formatting, imd_io.c:190).
//
// The TPU compute path is JAX/XLA/Pallas; this is the host-side data
// plane: parsing and formatting multi-hundred-MB ASCII .chkpt bodies is
// 20-50x faster here than NumPy's loadtxt/savetxt.  Exposed as extern
// "C" for ctypes; OpenMP parallel over row chunks.
//
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC chkptio.cpp
//        -o libchkptio.so     (done on demand by native/__init__.py)

#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// Count data rows (non-empty, non-comment lines).
long chkpt_count_rows(const char* buf, long n) {
    long rows = 0;
    long i = 0;
    while (i < n) {
        // skip leading spaces
        while (i < n && (buf[i] == ' ' || buf[i] == '\t' || buf[i] == '\r'))
            i++;
        bool content = (i < n && buf[i] != '\n' && buf[i] != '#');
        while (i < n && buf[i] != '\n') i++;
        if (content) rows++;
        i++;
    }
    return rows;
}

// Parse whitespace-separated doubles, ncols per row, skipping comment
// lines.  Returns rows parsed, or -(1+row) on a malformed row.
long chkpt_parse(const char* buf, long n, double* out, long ncols,
                 long max_rows) {
    // index line starts first (serial scan), then parse in parallel
    std::vector<long> starts;
    starts.reserve(1 << 20);
    {
        long i = 0;
        while (i < n) {
            long s = i;
            while (i < n && (buf[i] == ' ' || buf[i] == '\t'
                             || buf[i] == '\r'))
                i++;
            bool content = (i < n && buf[i] != '\n' && buf[i] != '#');
            while (i < n && buf[i] != '\n') i++;
            if (content) starts.push_back(s);
            i++;
        }
    }
    long rows = (long)starts.size();
    if (rows > max_rows) rows = max_rows;
    volatile long bad = -1;

#pragma omp parallel for schedule(static)
    for (long r = 0; r < rows; r++) {
        if (bad >= 0) continue;
        const char* p = buf + starts[r];
        const char* end = buf + n;
        double* dst = out + r * ncols;
        for (long c = 0; c < ncols; c++) {
            char* next = nullptr;
            // strtod needs a NUL-terminated-ish region; lines are short
            // and the buffer ends with the file, so this is safe except
            // for the very last byte, which callers pad.
            double v = strtod(p, &next);
            if (next == p) { bad = r; break; }
            dst[c] = v;
            p = next;
            if (p >= end) { if (c + 1 < ncols) bad = r; break; }
        }
    }
    if (bad >= 0) return -(1 + bad);
    return rows;
}

// Format rows of doubles: first int_cols columns as integers, the rest
// as %.*g.  Returns bytes written (excluding NUL) or -1 if the buffer
// is too small.  Parallel: each chunk formats into its own region after
// a sizing pass.
long chkpt_format(const double* data, long rows, long ncols,
                  long int_cols, int precision, char* out, long out_cap) {
    if (rows == 0) return 0;
    int nthreads = 1;
#ifdef _OPENMP
    nthreads = omp_get_max_threads();
#endif
    long chunk = (rows + nthreads - 1) / nthreads;
    std::vector<std::string> parts(nthreads);

#pragma omp parallel num_threads(nthreads)
    {
#ifdef _OPENMP
        int t = omp_get_thread_num();
#else
        int t = 0;
#endif
        long lo = t * chunk;
        long hi = lo + chunk < rows ? lo + chunk : rows;
        std::string& s = parts[t];
        s.reserve((hi > lo ? hi - lo : 0) * (ncols * (precision + 8)));
        char tmp[64];
        for (long r = lo; r < hi; r++) {
            const double* row = data + r * ncols;
            for (long c = 0; c < ncols; c++) {
                int len;
                if (c < int_cols)
                    len = snprintf(tmp, sizeof tmp, "%lld",
                                   (long long)row[c]);
                else
                    len = snprintf(tmp, sizeof tmp, "%.*g", precision,
                                   row[c]);
                if (c) s.push_back(' ');
                s.append(tmp, len);
            }
            s.push_back('\n');
        }
    }
    long total = 0;
    for (auto& s : parts) total += (long)s.size();
    if (total > out_cap) return -1;
    long off = 0;
    for (auto& s : parts) {
        memcpy(out + off, s.data(), s.size());
        off += (long)s.size();
    }
    return total;
}

}  // extern "C"
