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

// Write n (x, y, d) int32 triples as "x y d\n" text lines — the supports
// file format (byte-identical to numpy.savetxt(fmt="%d")).  A 344k-line
// savetxt costs ~750 ms; this loop ~30 ms.  Returns 0 on success.
int ogpc_write_supports(const char* path, const int32_t* a, int64_t n) {
  FILE* f = fopen(path, "wb");
  if (!f) return 1;
  // hand-rolled itoa into a line buffer: fprintf's format parsing is the
  // bottleneck at this volume
  char buf[1 << 15];
  size_t pos = 0;
  for (int64_t i = 0; i < n; i++) {
    if (pos + 40 > sizeof(buf)) {
      if (fwrite(buf, 1, pos, f) != pos) { fclose(f); return 1; }
      pos = 0;
    }
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
  int rc = fwrite(buf, 1, pos, f) != pos;
  return fclose(f) ? 1 : rc;
}

}  // extern "C"
