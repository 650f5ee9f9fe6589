// Native support-buffer decoding for opengpc_tpu.
//
// Host-side runtime component: the masked sorted-order output contract
// (opengpc_tpu/match.py match_epipolar_masked) moves the per-row
// left-packing off the device; its host-side decode — scan the (H, 2W)
// masked buffer and emit (x, y, d) triples — is the counterpart of the
// reference walking its std::vector<Support> (inference.hpp:384-391).
// One sequential pass here replaces numpy's nonzero + fancy-indexing
// (~5 ms at Sintel scale) with ~1 ms of branch-light scanning.
//
// C ABI, loaded via ctypes alongside the PNG codec (same .so).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// One thread's share of the masked-buffer scan: rows [y0, y1), writing each
// row at its prefix-sum offset.  Branchless store-always/advance-on-hit as in
// the sequential scan; a row holding MORE hits than its count overruns into
// the NEXT row's region, which this thread overwrites when it processes that
// row (rows ascend) — only stores past `rend` (the range's end offset, i.e.
// the next THREAD's territory) divert to the caller-provided per-thread
// scratch triple, so ranges never race.  Returns the hits seen; sets
// *mismatch when ANY row's actual hit count differs from its expected
// count (offs[y+1] - offs[y]) — unlike the sequential scan the output
// placement here DEPENDS on the per-row counts being right, so per-row
// errors that cancel in total (row A short, row B long) must still be
// reported, not just a wrong grand total.
int64_t scan_rows(const int32_t* buf, int64_t w2, int64_t y0, int64_t y1,
                  const int64_t* offs, int bd, int32_t dmask,
                  int32_t sentinel, int32_t disp_high, int32_t* out,
                  int64_t rend, int32_t* scratch, bool* mismatch) {
  int64_t hits = 0;
  for (int64_t y = y0; y < y1; y++) {
    const int32_t* row = buf + y * w2;
    const int32_t yy = static_cast<int32_t>(y);
    int64_t slot = offs[y];
    for (int64_t i = 0; i < w2; i++) {
      int32_t v = row[i];
      int32_t* o = slot < rend ? out + 3 * slot : scratch;
      o[0] = v >> bd;
      o[1] = yy;
      o[2] = (v & dmask) - disp_high;
      slot += (v != sentinel);
    }
    if (slot != offs[y + 1]) *mismatch = true;
    hits += slot - offs[y];
  }
  return hits;
}

// Format (x, y, d) triples [i0, i1) as "x y d\n" lines into `buf` (caller
// sizes it for 40 bytes/triple).  Returns bytes written.
size_t format_triples(const int32_t* a, int64_t i0, int64_t i1, char* buf) {
  size_t pos = 0;
  for (int64_t i = i0; i < i1; i++) {
    for (int c = 0; c < 3; c++) {
      // widen before negating: -INT32_MIN is signed-overflow UB
      int64_t v = a[3 * i + c];
      if (v < 0) { buf[pos++] = '-'; v = -v; }
      char tmp[12];
      int t = 0;
      do { tmp[t++] = static_cast<char>('0' + v % 10); v /= 10; } while (v);
      while (t) buf[pos++] = tmp[--t];
      buf[pos++] = c == 2 ? '\n' : ' ';
    }
  }
  return pos;
}

}  // namespace

extern "C" {

// buf: h*w2 int32, row-major; entries != sentinel hold (x << bd) | (d +
// disp_high) with bd = bit_length(2*disp_high).  Writes (x, y, d) int32
// triples to out in scan order (y ascending, window position ascending —
// identical to the numpy fallback in infer.masked_supports_to_numpy).
// The caller must size out for max_out + 1 triples (slot max_out is
// scratch for the branchless store).  Returns the TOTAL number of
// non-sentinel entries seen (may exceed max_out; only the first max_out
// are materialized).
int64_t ogpc_masked_decode(const int32_t* buf, int64_t h, int64_t w2,
                           int32_t disp_high, int32_t sentinel,
                           int32_t* out, int64_t max_out) {
  int bd = 1;
  while ((int64_t{1} << bd) <= int64_t{2} * disp_high) bd++;
  const int32_t dmask = (int32_t{1} << bd) - 1;
  int64_t n = 0;
  for (int64_t y = 0; y < h; y++) {
    const int32_t* row = buf + y * w2;
    const int32_t yy = static_cast<int32_t>(y);
    for (int64_t i = 0; i < w2; i++) {
      int32_t v = row[i];
      // Branchless: store every element at the current slot (a miss is
      // overwritten by the next element), advance only on hits — support
      // densities here are ~10-50%, where a conditional store would
      // mispredict constantly (measured 3.8 ms branchy vs ~1 ms this way
      // at Sintel scale).  Slot max_out is caller-provided scratch, so a
      // buffer holding MORE hits than the row-count sum keeps counting
      // without overflowing and the caller can detect the mismatch.
      int64_t slot = n < max_out ? n : max_out;
      int32_t* o = out + 3 * slot;
      o[0] = v >> bd;
      o[1] = yy;
      o[2] = (v & dmask) - disp_high;
      n += (v != sentinel);
    }
  }
  return n;
}

// Parallel variant of ogpc_masked_decode: `row_counts` (h int32, the
// matcher's per-row device output) gives each row's expected support count,
// so a prefix sum fixes every row's output offset up front and the scan
// parallelizes over contiguous row ranges with zero coordination — the
// per-element cost is uniform in w2, so an equal-rows split is balanced.
// Output is identical to the sequential scan whenever the buffer agrees
// with row_counts (each row lands at its own offset); on ANY per-row
// disagreement — including errors that cancel in the grand total —
// returns -1 so the caller raises (stricter than the sequential scan's
// total-only check, because placement here depends on the counts).
// nthreads <= 1 runs inline.
int64_t ogpc_masked_decode_par(const int32_t* buf, int64_t h, int64_t w2,
                               int32_t disp_high, int32_t sentinel,
                               const int32_t* row_counts, int32_t* out,
                               int64_t max_out, int32_t nthreads) {
  int bd = 1;
  while ((int64_t{1} << bd) <= int64_t{2} * disp_high) bd++;
  const int32_t dmask = (int32_t{1} << bd) - 1;

  std::vector<int64_t> offs(static_cast<size_t>(h) + 1);
  offs[0] = 0;
  for (int64_t y = 0; y < h; y++) {
    int32_t c = row_counts[y];
    offs[y + 1] = offs[y] + (c > 0 ? c : 0);
  }

  int64_t t = nthreads > 1 ? nthreads : 1;
  if (t > h) t = h > 0 ? h : 1;
  if (t == 1) {
    int32_t scratch[3];
    bool mismatch = false;
    int64_t n = scan_rows(buf, w2, 0, h, offs.data(), bd, dmask, sentinel,
                          disp_high, out, max_out, scratch, &mismatch);
    return mismatch ? -1 : n;
  }

  // per-thread result slot + scratch triple, each on its own cache line
  // (ADVICE r4: the adjacent hits/bad elements were false-sharing hot;
  // only the scratch triples had padding)
  struct alignas(64) Slot {
    int64_t hits = 0;
    uint8_t bad = 0;
    int32_t scratch[3] = {0, 0, 0};
  };
  std::vector<Slot> slots(static_cast<size_t>(t));
  std::vector<std::thread> workers;
  workers.reserve(static_cast<size_t>(t));
  for (int64_t k = 0; k < t; k++) {
    int64_t y0 = h * k / t, y1 = h * (k + 1) / t;
    int64_t rend = offs[y1] < max_out ? offs[y1] : max_out;
    workers.emplace_back([=, &offs, &slots] {
      Slot& s = slots[static_cast<size_t>(k)];
      bool mismatch = false;
      s.hits = scan_rows(buf, w2, y0, y1, offs.data(), bd, dmask, sentinel,
                         disp_high, out, rend, s.scratch, &mismatch);
      s.bad = mismatch;
    });
  }
  int64_t n = 0;
  bool mismatch = false;
  for (int64_t k = 0; k < t; k++) {
    workers[static_cast<size_t>(k)].join();
    n += slots[static_cast<size_t>(k)].hits;
    mismatch |= slots[static_cast<size_t>(k)].bad != 0;
  }
  return mismatch ? -1 : n;
}

// Write n (x, y, d) int32 triples as "x y d\n" text lines — the supports
// file format (byte-identical to numpy.savetxt(fmt="%d")).  A 344k-line
// savetxt costs ~750 ms; this loop ~30 ms.  Returns 0 on success.
int ogpc_write_supports_par(const char* path, const int32_t* a, int64_t n,
                            int32_t nthreads);

int ogpc_write_supports(const char* path, const int32_t* a, int64_t n) {
  return ogpc_write_supports_par(path, a, n, 1);
}

// Parallel variant: the hand-rolled itoa (fprintf's format parsing is the
// bottleneck at this volume; a 344k-line savetxt costs ~750 ms, the
// sequential loop ~30 ms) is pure per-line work, so each thread formats an
// equal slice of the triples into its own fixed-size buffer and the
// buffers are written out in order.  Memory stays bounded regardless of n:
// triples are processed in blocks of t * 64Ki (one 2.5 MB buffer per
// thread, reused across blocks), so a 10M-triple file streams instead of
// materializing ~400 MB of formatted text.  nthreads <= 1 formats inline
// over the same block loop.  Returns 0 on success.
int ogpc_write_supports_par(const char* path, const int32_t* a, int64_t n,
                            int32_t nthreads) {
  int64_t t = nthreads > 1 ? nthreads : 1;
  if (t > n) t = n > 0 ? n : 1;
  const int64_t per_thread = int64_t{1} << 16;  // triples per thread per block
  const int64_t block = t * per_thread;
  std::vector<std::vector<char>> bufs(static_cast<size_t>(t));
  for (auto& b : bufs) b.resize(static_cast<size_t>(40 * per_thread));
  std::vector<size_t> lens(static_cast<size_t>(t), 0);
  FILE* f = fopen(path, "wb");
  if (!f) return 1;
  int rc = 0;
  for (int64_t b0 = 0; b0 < n; b0 += block) {
    int64_t m = n - b0 < block ? n - b0 : block;
    int64_t tb = t < m ? t : m;  // threads this block
    // slice size ceil(m / tb) <= per_thread since m <= tb * per_thread
    // whenever tb == t; when m < t each slice is one triple.
    auto fmt = [&](int64_t k) {
      int64_t i0 = b0 + m * k / tb, i1 = b0 + m * (k + 1) / tb;
      lens[static_cast<size_t>(k)] =
          format_triples(a, i0, i1, bufs[static_cast<size_t>(k)].data());
    };
    if (tb == 1) {
      fmt(0);
    } else {
      std::vector<std::thread> workers;
      workers.reserve(static_cast<size_t>(tb));
      for (int64_t k = 0; k < tb; k++) workers.emplace_back(fmt, k);
      for (auto& w : workers) w.join();
    }
    for (int64_t k = 0; k < tb && !rc; k++) {
      size_t len = lens[static_cast<size_t>(k)];
      if (len && fwrite(bufs[static_cast<size_t>(k)].data(), 1, len, f) != len)
        rc = 1;
    }
    if (rc) break;  // dead stream: don't format/write the remaining blocks
  }
  return fclose(f) ? 1 : rc;
}

}  // extern "C"
