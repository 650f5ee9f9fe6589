// ASan/UBSan driver for the host decode helpers (decode.cc): exercises
// ogpc_masked_decode (sequential + parallel incl. a thread-boundary
// overrun into the per-thread scratch) over a ~33% dense masked buffer
// and ogpc_write_supports / ogpc_write_supports_par including INT32_MIN
// (the widen-before-negate case).
// Build + run: make -C cpp asan_decode
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

extern "C" int64_t ogpc_masked_decode(const int32_t*, int64_t, int64_t,
                                      int32_t, int32_t, int32_t*, int64_t);
extern "C" int64_t ogpc_masked_decode_par(const int32_t*, int64_t, int64_t,
                                          int32_t, int32_t, const int32_t*,
                                          int32_t*, int64_t, int32_t);
extern "C" int ogpc_write_supports(const char*, const int32_t*, int64_t);
extern "C" int ogpc_write_supports_par(const char*, const int32_t*, int64_t,
                                       int32_t);

static int64_t fsize(const char* p) {
  FILE* f = fopen(p, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  int64_t n = ftell(f);
  fclose(f);
  return n;
}

static int files_equal(const char* a, const char* b) {
  int64_t na = fsize(a), nb = fsize(b);
  if (na != nb || na < 0) return 0;
  FILE* fa = fopen(a, "rb");
  FILE* fb = fopen(b, "rb");
  char ba[1 << 14], bb[1 << 14];
  int eq = 1;
  while (na > 0) {
    size_t want = na > (int64_t)sizeof(ba) ? sizeof(ba) : (size_t)na;
    if (fread(ba, 1, want, fa) != want || fread(bb, 1, want, fb) != want ||
        memcmp(ba, bb, want) != 0) {
      eq = 0;
      break;
    }
    na -= (int64_t)want;
  }
  fclose(fa);
  fclose(fb);
  return eq;
}

int main(void) {
  int64_t h = 436, w2 = 2048;
  int32_t* buf = static_cast<int32_t*>(malloc(h * w2 * 4));
  int32_t* counts = static_cast<int32_t*>(malloc(h * 4));
  for (int64_t y = 0; y < h; y++) counts[y] = 0;
  for (int64_t i = 0; i < h * w2; i++) {
    int hit = (i % 3) == 0;
    buf[i] = hit ? static_cast<int32_t>(((i % 1024) << 9) | (i % 257))
                 : 0x7FFFFFFF;
    counts[i / w2] += hit;
  }
  int64_t hits = 0;
  for (int64_t y = 0; y < h; y++) hits += counts[y];

  int32_t* out = static_cast<int32_t*>(malloc((hits + 1) * 3 * 4));
  int64_t n = ogpc_masked_decode(buf, h, w2, 128, 0x7FFFFFFF, out, hits);
  if (n != hits) {
    printf("FAIL seq count %lld vs %lld\n", (long long)n, (long long)hits);
    return 1;
  }

  // parallel decode: same counts, outputs byte-identical to sequential
  int32_t* out_p = static_cast<int32_t*>(malloc((hits + 1) * 3 * 4));
  for (int32_t t = 1; t <= 7; t += 3) {
    memset(out_p, 0, (hits + 1) * 3 * 4);
    int64_t np = ogpc_masked_decode_par(buf, h, w2, 128, 0x7FFFFFFF, counts,
                                        out_p, hits, t);
    if (np != hits || memcmp(out, out_p, hits * 3 * 4) != 0) {
      printf("FAIL par t=%d count %lld vs %lld / content\n", t,
             (long long)np, (long long)hits);
      return 1;
    }
  }

  // mismatch: understate one row's count — the trailing hits overrun into
  // the next rows' regions (overwritten) or the thread scratch at a range
  // boundary; the per-row check reports -1 so the caller raises.  ASan
  // verifies no out-of-bounds writes.
  counts[0] -= 5;
  counts[h - 1] -= 3;  // last row: overrun goes to scratch, not past out
  int64_t nm = ogpc_masked_decode_par(buf, h, w2, 128, 0x7FFFFFFF, counts,
                                      out_p, hits - 8, 7);
  if (nm != -1) {
    printf("FAIL mismatch not reported: %lld\n", (long long)nm);
    return 1;
  }
  counts[0] += 5;
  counts[h - 1] += 3;

  // canceling mismatch: row 0 short by 2, row 1 long by 2 — the grand
  // total matches sum(row_counts), but placement is corrupt, so the
  // per-row check must still report -1 (a total-only check would pass
  // and silently return garbage triples).
  counts[0] -= 2;
  counts[1] += 2;
  nm = ogpc_masked_decode_par(buf, h, w2, 128, 0x7FFFFFFF, counts, out_p,
                              hits, 7);
  if (nm != -1) {
    printf("FAIL canceling mismatch not reported: %lld\n", (long long)nm);
    return 1;
  }
  counts[0] += 2;
  counts[1] -= 2;

  out[0] = -2147483647 - 1;  // INT32_MIN through the writer
  if (ogpc_write_supports("/tmp/ogpc_asan_supports.txt", out, hits)) return 1;
  if (ogpc_write_supports_par("/tmp/ogpc_asan_supports_par.txt", out, hits, 7))
    return 1;
  if (!files_equal("/tmp/ogpc_asan_supports.txt",
                   "/tmp/ogpc_asan_supports_par.txt")) {
    printf("FAIL writer par != seq\n");
    return 1;
  }
  printf("decode+writer clean (seq+par), n=%lld\n", (long long)n);
  free(buf);
  free(counts);
  free(out);
  free(out_p);
  return 0;
}
