// ASan/UBSan driver for the host decode helpers (decode.cc): exercises
// ogpc_masked_decode over a ~33% dense masked buffer and
// ogpc_write_supports including INT32_MIN (the widen-before-negate case).
// Build + run: make -C cpp asan_decode
#include <cstdint>
#include <cstdio>
#include <cstdlib>

extern "C" int64_t ogpc_masked_decode(const int32_t*, int64_t, int64_t,
                                      int32_t, int32_t, int32_t*, int64_t);
extern "C" int ogpc_write_supports(const char*, const int32_t*, int64_t);

int main(void) {
  int64_t h = 436, w2 = 2048;
  int32_t* buf = static_cast<int32_t*>(malloc(h * w2 * 4));
  for (int64_t i = 0; i < h * w2; i++)
    buf[i] = (i % 3) ? 0x7FFFFFFF
                     : static_cast<int32_t>(((i % 1024) << 9) | (i % 257));
  int64_t hits = 0;
  for (int64_t i = 0; i < h * w2; i++) hits += buf[i] != 0x7FFFFFFF;
  int32_t* out = static_cast<int32_t*>(malloc((hits + 1) * 3 * 4));
  int64_t n = ogpc_masked_decode(buf, h, w2, 128, 0x7FFFFFFF, out, hits);
  if (n != hits) {
    printf("FAIL count %lld vs %lld\n", (long long)n, (long long)hits);
    return 1;
  }
  out[0] = -2147483647 - 1;  // INT32_MIN through the writer
  if (ogpc_write_supports("/tmp/ogpc_asan_supports.txt", out, hits)) return 1;
  printf("decode+writer clean, n=%lld\n", (long long)n);
  free(buf);
  free(out);
  return 0;
}
