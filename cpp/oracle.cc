// CPU golden oracle for opengpc_tpu parity tests.
//
// A from-scratch reimplementation of the *scalar/naive* semantics of the
// reference openGPC pipeline (the contract per SURVEY.md §7 "Hard parts"):
//   box 3x3      — /root/reference/lib/gpc/filter.hpp:198-223 (+ clearBoundary
//                  buffer.hpp:630-654)
//   sobel 3x3    — filter.hpp:157-188 (sx,sy each /9, binary (sx^2+sy^2) > t^2)
//   gpc codes    — filter.hpp:237-282 (test 0 at MSB; tau: img[i] > img[j]-tau)
//   candidates   — inference.hpp:302-333 (gradient pixels with margin 13)
//   epipolar     — inference.hpp:192-197 (state |= y << 32)
//   matcher      — inference.hpp:227-254, in two flavors:
//                    clean: code unique in both images and equal
//                    quirk: the reference's exact sweep incl. its
//                           last-element edge behavior
//   rectified    — inference.hpp:375-393 (|dy| <= vt, |dx| <= dispHigh)
//   census 5x5   — filter.hpp:692-712
//   fern train   — Fern.hpp:209-372 with externally supplied hyperplane
//                  candidates (RNG is injected, not replicated)
//
// This file deliberately shares no code or structure with the reference:
// plain 2-D indexing on tightly packed row-major arrays, no Eigen, no SIMD.
//
// Raw image container format ("OGPCRAW"): see opengpc_tpu/io/raw.py.

#include <algorithm>
#include <array>
#include <cstdint>
#include <cstdlib>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

namespace {

struct Img {
  int h = 0, w = 0;
  int dtype = 0;  // 0=u8, 1=u32, 2=i32, 3=f32
  std::vector<uint8_t> bytes;

  uint8_t* u8() { return bytes.data(); }
  const uint8_t* u8() const { return bytes.data(); }
  uint32_t* u32() { return reinterpret_cast<uint32_t*>(bytes.data()); }
};

constexpr char kMagic[8] = {'O', 'G', 'P', 'C', 'R', 'A', 'W', '1'};
const int kDtypeSize[4] = {1, 4, 4, 4};

Img readRaw(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) {
    std::cerr << "cannot open " << path << "\n";
    exit(2);
  }
  char magic[8];
  int32_t hdr[3];
  f.read(magic, 8);
  f.read(reinterpret_cast<char*>(hdr), 12);
  if (memcmp(magic, kMagic, 8) != 0) {
    std::cerr << path << ": bad magic\n";
    exit(2);
  }
  Img img;
  img.dtype = hdr[0];
  img.h = hdr[1];
  img.w = hdr[2];
  img.bytes.resize(size_t(img.h) * img.w * kDtypeSize[img.dtype]);
  f.read(reinterpret_cast<char*>(img.bytes.data()), img.bytes.size());
  if (!f) {
    std::cerr << path << ": truncated\n";
    exit(2);
  }
  return img;
}

void writeRaw(const Img& img, const std::string& path) {
  std::ofstream f(path, std::ios::binary);
  int32_t hdr[3] = {img.dtype, img.h, img.w};
  f.write(kMagic, 8);
  f.write(reinterpret_cast<const char*>(hdr), 12);
  f.write(reinterpret_cast<const char*>(img.bytes.data()), img.bytes.size());
}

// 3x3 box mean with floor division by 9 on the interior region
// y in [1, h-3], x in [2, w-2]; zero elsewhere.  This is the net effect of
// the reference's boxNaive + clearBoundary (see header comment).
Img box3(const Img& in) {
  Img out;
  out.h = in.h;
  out.w = in.w;
  out.dtype = 0;
  out.bytes.assign(size_t(in.h) * in.w, 0);
  for (int y = 1; y <= in.h - 3; y++) {
    for (int x = 2; x <= in.w - 2; x++) {
      int sum = 0;
      for (int dy = -1; dy <= 1; dy++)
        for (int dx = -1; dx <= 1; dx++) sum += in.u8()[(y + dy) * in.w + (x + dx)];
      out.u8()[y * in.w + x] = uint8_t(sum / 9);
    }
  }
  return out;
}

// Binary sobel gradient on the region the candidate filter can ever see
// (margin >= 1 here; callers apply the margin-13 filter).  sx and sy are
// each divided by 9 with C truncation before squaring.
Img sobel3(const Img& in, int threshold) {
  Img out;
  out.h = in.h;
  out.w = in.w;
  out.dtype = 0;
  out.bytes.assign(size_t(in.h) * in.w, 0);
  int t2 = threshold * threshold;
  for (int y = 1; y < in.h - 1; y++) {
    for (int x = 1; x < in.w - 1; x++) {
      const uint8_t* p = in.u8();
      int w = in.w;
      int a00 = p[(y - 1) * w + x - 1], a01 = p[(y - 1) * w + x], a02 = p[(y - 1) * w + x + 1];
      int a10 = p[y * w + x - 1], a12 = p[y * w + x + 1];
      int a20 = p[(y + 1) * w + x - 1], a21 = p[(y + 1) * w + x], a22 = p[(y + 1) * w + x + 1];
      int sx = (a00 + a20 + 2 * a10 - a02 - 2 * a12 - a22) / 9;
      int sy = (a00 + a02 + 2 * a01 - a20 - 2 * a21 - a22) / 9;
      int val = sx * sx + sy * sy;
      out.u8()[y * w + x] = val > t2 ? 255 : 0;
    }
  }
  return out;
}

struct TestDef {
  int ix, iy, jx, jy, tau;
};

struct ForestDef {
  std::vector<TestDef> tests;  // capped at 32, file order
  bool zero = true;            // all taus (incl. beyond cap) zero
};

ForestDef readForest(const std::string& path) {
  std::ifstream f(path);
  if (!f) {
    std::cerr << "cannot open forest " << path << "\n";
    exit(2);
  }
  ForestDef fd;
  int numFerns;
  f >> numFerns;
  for (int i = 0; i < numFerns; i++) {
    int id, numTests;
    std::string scale;
    f >> id >> scale >> numTests;
    for (int j = 0; j < numTests; j++) {
      TestDef t;
      int level;
      f >> level >> t.ix >> t.iy >> t.jx >> t.jy >> t.tau;
      if (t.tau != 0) fd.zero = false;
      if (int(fd.tests.size()) < 32) fd.tests.push_back(t);
    }
  }
  return fd;
}

// Candidate pixels: gradient nonzero with margin 13 (inference.hpp:318-325).
std::vector<std::pair<int, int>> candidates(const Img& grad) {
  std::vector<std::pair<int, int>> out;  // (y, x) in row-major scan order
  for (int y = 13; y < grad.h - 13; y++)
    for (int x = 13; x < grad.w - 13; x++)
      if (grad.u8()[y * grad.w + x]) out.emplace_back(y, x);
  return out;
}

// Leaf code at (y, x): fold tests MSB-first, test = smooth[i] > smooth[j]-tau
// (filter.hpp:243-251, 271-279).
uint32_t codeAt(const Img& smooth, const ForestDef& fd, int y, int x) {
  uint32_t code = 0;
  for (const TestDef& t : fd.tests) {
    int a = smooth.u8()[(y + t.iy) * smooth.w + (x + t.ix)];
    int b = smooth.u8()[(y + t.jy) * smooth.w + (x + t.jx)];
    code <<= 1;
    if (a > b - t.tau) code |= 1;
  }
  return code;
}

struct Desc {
  uint64_t state;
  int x, y;
  bool operator<(const Desc& o) const { return state < o.state; }
};

std::vector<Desc> descriptors(const Img& smooth, const Img& grad, const ForestDef& fd,
                              bool epipolar) {
  std::vector<Desc> out;
  for (auto& yx : candidates(grad)) {
    Desc d;
    d.y = yx.first;
    d.x = yx.second;
    d.state = codeAt(smooth, fd, d.y, d.x);
    if (epipolar) d.state |= uint64_t(d.y) << 32;
    out.push_back(d);
  }
  return out;
}

struct Corr {
  int sx, sy, tx, ty;
};

// Clean unique-collision rule: state present exactly once in src, exactly
// once in tar, equal.
std::vector<Corr> matchClean(std::vector<Desc> src, std::vector<Desc> tar) {
  std::sort(src.begin(), src.end());
  std::sort(tar.begin(), tar.end());
  std::vector<Corr> out;
  size_t j = 0;
  for (size_t i = 0; i < src.size();) {
    size_t i2 = i;
    while (i2 + 1 < src.size() && src[i2 + 1].state == src[i].state) i2++;
    bool srcUnique = (i2 == i);
    if (srcUnique) {
      while (j < tar.size() && tar[j].state < src[i].state) j++;
      if (j < tar.size() && tar[j].state == src[i].state &&
          (j + 1 >= tar.size() || tar[j + 1].state != tar[j].state))
        out.push_back({src[i].x, src[i].y, tar[j].x, tar[j].y});
    }
    i = i2 + 1;
  }
  return out;
}

// The reference's exact sweep (inference.hpp:227-254) including its edge
// quirks: a match landing on the last tar element is never emitted, and a
// duplicate pair occupying the last two tar slots skips its uniqueness
// check.
std::vector<Corr> matchQuirk(std::vector<Desc> src, std::vector<Desc> tar) {
  std::sort(src.begin(), src.end());
  std::sort(tar.begin(), tar.end());
  std::vector<Corr> out;
  if (tar.empty()) return out;
  size_t j = 0;
  size_t n = tar.size();
  for (size_t i = 0; i < src.size(); ++i) {
    bool unique = true;
    while (i + 1 < src.size() && src[i].state == src[i + 1].state) {
      ++i;
      unique = false;
    }
    if (!unique) continue;
    for (; j < n - 1; ++j)
      if (!(tar[j].state < src[i].state)) break;
    if (j != n - 1 && tar[j].state == src[i].state &&
        (j + 1 == n - 1 || tar[j].state != tar[j + 1].state))
      out.push_back({src[i].x, src[i].y, tar[j].x, tar[j].y});
  }
  return out;
}

// Literal emulation of the reference's hash-table matcher
// (hashmatch.hpp:42-273): open hash over state % indexSize buckets; each
// bucket is an ordered insert (stable after equal states) CAPPED at 10
// elements (hashmatch.hpp:93-98) — later arrivals are silently dropped;
// then a per-bucket adjacent-pair sweep emits states present exactly twice
// and from different images (hashmatch.hpp:162-197), including its two edge
// behaviors: the early bucket return when an equal-third element is the
// bucket's last, and the skip-ahead after a same-image pair followed by a
// cross-image element.  Inserts happen src-list first, then tar-list, in
// candidate scan order (inference.hpp:204-224 depthPriorFast).
struct HDesc {
  uint64_t state;
  int x, y;
  bool src;
};

std::vector<Corr> matchHash(const std::vector<Desc>& srcv, const std::vector<Desc>& tarv,
                            int indexSize) {
  std::vector<std::vector<HDesc>> buckets(indexSize);
  auto insert = [&](const Desc& d, bool isSrc) {
    std::vector<HDesc>& b = buckets[size_t(d.state % uint64_t(indexSize))];
    if (int(b.size()) >= 10) return;  // bucket cap, drop silently
    size_t pos = 0;
    while (pos < b.size() && b[pos].state <= d.state) pos++;  // after equals
    b.insert(b.begin() + pos, HDesc{d.state, d.x, d.y, isSrc});
  };
  for (const Desc& d : srcv) insert(d, true);
  for (const Desc& d : tarv) insert(d, false);

  std::vector<Corr> out;
  for (const std::vector<HDesc>& b : buckets) {
    size_t n = b.size();
    size_t idx = 0;  // the list walk: prev/idx mirror prev/next pointers
    while (idx < n) {
      size_t prev = idx;
      idx++;
      if (idx < n && b[prev].state == b[idx].state) {
        if (b[prev].src != b[idx].src) {
          if (idx + 1 < n) {  // a third element exists
            if (b[idx + 1].state != b[idx].state)
              out.push_back({b[prev].x, b[prev].y, b[idx].x, b[idx].y});
            if (idx + 2 >= n) break;  // "checked the last triplet, leave"
          } else {
            out.push_back({b[prev].x, b[prev].y, b[idx].x, b[idx].y});
          }
        } else if (idx + 1 < n && b[idx].src != b[idx + 1].src) {
          // same-image pair then cross-image element: skip the false pair
          idx++;
        }
      }
    }
  }
  return out;
}

// 5x5 census transform, 24-bit codes (filter.hpp:692-712): bit i set iff
// neighbor > center, neighbors scanned px (outer, -2..2) then py, skipping
// the center; valid rows y in [2, h-4], all x with full window.
Img census5(const Img& in) {
  Img out;
  out.h = in.h;
  out.w = in.w;
  out.dtype = 1;
  out.bytes.assign(size_t(in.h) * in.w * 4, 0);
  for (int y = 2; y <= in.h - 4; y++) {
    for (int x = 2; x <= in.w - 3; x++) {
      uint32_t val = 0;
      int i = 0;
      int c = in.u8()[y * in.w + x];
      for (int px = -2; px <= 2; px++) {
        for (int py = -2; py <= 2; py++) {
          if (px == 0 && py == 0) continue;
          if (in.u8()[(y + py) * in.w + (x + px)] > c) val |= (1u << i);
          i++;
        }
      }
      out.u32()[y * in.w + x] = val;
    }
  }
  return out;
}

void writeSupports(const std::vector<Corr>& corr, int vt, int dispHigh,
                   const std::string& path) {
  std::ofstream f(path);
  for (const Corr& c : corr) {
    if (std::abs(c.sy - c.ty) <= vt && std::abs(c.sx - c.tx) <= dispHigh)
      f << c.sx << " " << c.sy << " " << (c.sx - c.tx) << "\n";
  }
}

// ---------------------------------------------------------------------
// Fern training with injected hyperplane candidates (Fern.hpp:209-372).
// ---------------------------------------------------------------------

struct TripletSet {
  // patches[n][k][i], k in {ref,pos,neg}, i the 729-byte patch linear index
  std::vector<std::array<std::vector<uint8_t>, 3>> data;
};

TripletSet readTriplets(const std::string& path) {
  std::ifstream f(path, std::ios::binary | std::ios::ate);
  if (!f) {
    std::cerr << "cannot open " << path << "\n";
    exit(2);
  }
  size_t size = f.tellg();
  f.seekg(0);
  if (size % 2187) {
    std::cerr << path << ": bad triplet file size\n";
    exit(2);
  }
  TripletSet ts;
  ts.data.resize(size / 2187);
  for (auto& t : ts.data)
    for (int k = 0; k < 3; k++) {
      t[k].resize(729);
      f.read(reinterpret_cast<char*>(t[k].data()), 729);
    }
  return ts;
}

struct Stats {
  long tp = 0, fp = 0, fn = 0, tot = 0;
  double prec = 0, rec = 0, hmean = 0;
};

// evalSplit (Fern.hpp:209-262): code equality over levels [0, level],
// scored on samples not yet marked split; hmean = p*r / ((1-w2)p + w2 r).
Stats evalSplit(const TripletSet& ts, const std::vector<std::array<int, 3>>& params,
                const std::vector<bool>& splitPos, const std::vector<bool>& splitNeg,
                int level, double w1) {
  Stats s;
  for (size_t n = 0; n < ts.data.size(); n++) {
    uint64_t code[3] = {0, 0, 0};
    for (int l = 0; l <= level; l++) {
      int i = params[l][0], j = params[l][1], tau = params[l][2];
      for (int k = 0; k < 3; k++) {
        code[k] <<= 1;
        if (int(ts.data[n][k][i]) - int(ts.data[n][k][j]) < tau) code[k] |= 1;
      }
    }
    if (splitPos[n] && splitNeg[n]) continue;
    s.tot++;
    bool eqPos = code[0] == code[1], eqNeg = code[0] == code[2];
    if (eqPos && !eqNeg)
      s.tp++;
    else if (eqPos == eqNeg)
      s.fn++;
    else if (!eqPos && eqNeg)
      s.fp++;
  }
  double w2 = 1.0 - w1;
  s.prec = (s.tp + s.fp) ? double(s.tp) / (s.tp + s.fp) : 0.0;
  s.rec = (s.tp + s.fn) ? double(s.tp) / (s.tp + s.fn) : 0.0;
  s.hmean = (s.prec + s.rec == 0.0) ? 0.0
                                    : s.prec * s.rec / ((1.0 - w2) * s.prec + w2 * s.rec);
  return s;
}

// train a fern with explicit per-level hyperplane candidates.
// candFile lines: "level i j" (patch linear indices), numResamples per level.
void trainFern(const std::string& tripletPath, const std::string& candPath, int depth,
               int taulo, int tauhi, double w1, bool onlyNonSplit,
               const std::string& outPath) {
  TripletSet ts = readTriplets(tripletPath);
  std::ifstream cf(candPath);
  std::vector<std::vector<std::pair<int, int>>> cands(depth);
  int level, ci, cj;
  while (cf >> level >> ci >> cj) cands[level].emplace_back(ci, cj);

  std::vector<std::array<int, 3>> params(depth, {0, 0, 0});
  std::vector<bool> splitPos(ts.data.size(), false), splitNeg(ts.data.size(), false);
  std::ofstream out(outPath);
  for (int l = 0; l < depth; l++) {
    double maxScore = 0.0;
    std::array<int, 3> best = {0, 0, 0};
    Stats last;
    for (auto& c : cands[l]) {
      for (int tau = taulo; tau < tauhi; tau++) {
        params[l] = {c.first, c.second, tau};
        Stats s = evalSplit(ts, params, splitPos, splitNeg, l, w1);
        last = s;
        if (s.hmean > maxScore) {
          best = params[l];
          maxScore = s.hmean;
        }
      }
    }
    params[l] = best;
    // stats actually used for selection: the chosen candidate scored with
    // the exclusion masks in force during the search (before this level's
    // markSplitSamples update) — Fern.hpp:236,333-334
    Stats ex = evalSplit(ts, params, splitPos, splitNeg, l, w1);
    if (onlyNonSplit) {
      // markSplitSamples called with numParams = level (Fern.hpp:357):
      // the prefix EXCLUDES the just-chosen test (empty at level 0,
      // which vacuously marks pos.split for every sample)
      for (size_t n = 0; n < ts.data.size(); n++) {
        uint64_t code[3] = {0, 0, 0};
        for (int m = 0; m < l; m++)
          for (int k = 0; k < 3; k++) {
            code[k] <<= 1;
            if (int(ts.data[n][k][params[m][0]]) - int(ts.data[n][k][params[m][1]]) <
                params[m][2])
              code[k] |= 1;
          }
        if (code[0] == code[1]) splitPos[n] = true;
        if (code[0] != code[2]) splitNeg[n] = true;
      }
    }
    Stats s = evalSplit(ts, params, std::vector<bool>(ts.data.size(), false),
                        std::vector<bool>(ts.data.size(), false), l, w1);
    // line: level i j tau  tp fp fn (unmasked)  score  tp fp fn tot (masked)
    out << l << " " << best[0] << " " << best[1] << " " << best[2] << " " << s.tp << " "
        << s.fp << " " << s.fn << " " << maxScore << " " << ex.tp << " " << ex.fp << " "
        << ex.fn << " " << ex.tot << "\n";
  }
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 2) {
    std::cerr << "usage: oracle <cmd> ...\n";
    return 1;
  }
  std::string cmd = argv[1];
  if (cmd == "box" && argc == 4) {
    writeRaw(box3(readRaw(argv[2])), argv[3]);
  } else if (cmd == "sobel" && argc == 5) {
    writeRaw(sobel3(readRaw(argv[2]), atoi(argv[4])), argv[3]);
  } else if (cmd == "census" && argc == 4) {
    writeRaw(census5(readRaw(argv[2])), argv[3]);
  } else if (cmd == "codes" && argc == 6) {
    // codes <smooth.raw> <grad.raw> <forest.txt> <out.raw>
    Img smooth = readRaw(argv[2]);
    Img grad = readRaw(argv[3]);
    ForestDef fd = readForest(argv[4]);
    Img out;
    out.h = smooth.h;
    out.w = smooth.w;
    out.dtype = 1;
    out.bytes.assign(size_t(out.h) * out.w * 4, 0);
    for (auto& yx : candidates(grad))
      out.u32()[yx.first * out.w + yx.second] = codeAt(smooth, fd, yx.first, yx.second);
    writeRaw(out, argv[5]);
  } else if (cmd == "sparsematch" && argc == 11) {
    // sparsematch <forest> <left.raw> <right.raw> <out.txt>
    //             <gradThresh> <vertTol> <dispHigh> <epipolar 0/1>
    //             <matcher: 0=clean 1=quirk 2=hashmatch>
    ForestDef fd = readForest(argv[2]);
    Img left = readRaw(argv[3]);
    Img right = readRaw(argv[4]);
    int gradThresh = atoi(argv[6]);
    int vt = atoi(argv[7]);
    int dispHigh = atoi(argv[8]);
    bool epipolar = atoi(argv[9]) != 0;
    int matcher = atoi(argv[10]);
    Img sl = box3(left), sr = box3(right);
    Img gl = sobel3(left, gradThresh), gr = sobel3(right, gradThresh);
    auto dl = descriptors(sl, gl, fd, epipolar);
    auto dr = descriptors(sr, gr, fd, epipolar);
    auto corr = matcher == 2   ? matchHash(dl, dr, 214673)
                : matcher == 1 ? matchQuirk(dl, dr)
                               : matchClean(dl, dr);
    writeSupports(corr, vt, dispHigh, argv[5]);
  } else if (cmd == "hashmatch" && argc == 6) {
    // hashmatch <desc.txt> <out.txt> <matcher: 0=clean 1=quirk 2=hash> <indexSize>
    // desc.txt lines: "img state x y" (img 0=src, 1=tar), file order =
    // insertion order.  Emits unfiltered pairs "sx sy tx ty" — matcher-level
    // differential testing on constructed descriptor sets.
    std::ifstream df(argv[2]);
    std::vector<Desc> src, tar;
    int img, x, y;
    uint64_t state;
    while (df >> img >> state >> x >> y) {
      Desc d;
      d.state = state;
      d.x = x;
      d.y = y;
      (img == 0 ? src : tar).push_back(d);
    }
    int matcher = atoi(argv[4]);
    int indexSize = atoi(argv[5]);
    auto corr = matcher == 2   ? matchHash(src, tar, indexSize)
                : matcher == 1 ? matchQuirk(src, tar)
                               : matchClean(src, tar);
    std::ofstream f(argv[3]);
    for (const Corr& c : corr)
      f << c.sx << " " << c.sy << " " << c.tx << " " << c.ty << "\n";
  } else if (cmd == "trainfern" && argc == 10) {
    // trainfern <triplets.bin> <cands.txt> <depth> <taulo> <tauhi> <w1>
    //           <onlyNonSplit 0/1> <out.txt>
    trainFern(argv[2], argv[3], atoi(argv[4]), atoi(argv[5]), atoi(argv[6]),
              atof(argv[7]), atoi(argv[8]) != 0, argv[9]);
  } else {
    std::cerr << "unknown command or bad arity: " << cmd << "\n";
    return 1;
  }
  return 0;
}
