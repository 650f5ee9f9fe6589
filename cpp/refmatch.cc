// refmatch: differential-test driver that compiles the UNMODIFIED reference
// openGPC headers (included read-only from /root/reference/lib at build
// time; nothing is copied into this repo) against cpp/eigen_shim, runs the
// exact samples/sparsematch.cpp flow (reference samples/sparsematch.cpp:29-58)
// and prints the Support set in the oracle's text format ("x y d" per line).
//
// Purpose (VERDICT round-1 item 1): converts every oracle-pinned parity test
// from "matches our transcription" to "matches the real reference binary" —
// cpp/oracle.cc sparsematch --quirk=1 must produce the identical support set.
//
// Usage:
//   refmatch <forest.txt> <left.png> <right.png> <out.txt>
//            <gradThresh> <vertTol> <dispHigh> <epipolar 0/1> <useHashtable 0/1>
//            [vis.png]
//
// The optional [vis.png] writes the reference's own disparity
// visualization (ndb::getDisparityVisualization Support overload +
// Buffer::writePNGRGB, exactly samples/sparsematch.cpp:61-62) so the
// Python CLI's --viz-compat reference output can be byte-diffed against
// the real reference binary's PNG.
//
// Build: make -C cpp refmatch   (skipped gracefully when /root/reference is
// absent; the pytest marks itself skipped in that case).

#include <cstdio>
#include <cstdlib>
#include <string>
#include <vector>

#include "gpc/inference.hpp"  // the real reference header tree

int main(int argc, char** argv) {
  if (argc != 10 && argc != 11) {
    std::fprintf(stderr,
                 "usage: refmatch <forest> <left.png> <right.png> <out.txt> "
                 "<gradThresh> <vertTol> <dispHigh> <epipolar> <useHashtable> "
                 "[vis.png]\n");
    return 1;
  }
  std::string forestPath = argv[1];
  std::string leftPath = argv[2];
  std::string rightPath = argv[3];
  std::string outPath = argv[4];
  int gradThresh = std::atoi(argv[5]);
  int vertTol = std::atoi(argv[6]);
  int dispHigh = std::atoi(argv[7]);
  bool epipolar = std::atoi(argv[8]) != 0;
  bool useHashtable = std::atoi(argv[9]) != 0;

  ndb::Buffer<uint8_t> simg, timg;
  if (simg.readPNG(leftPath) || timg.readPNG(rightPath)) {
    std::fprintf(stderr, "refmatch: cannot read images\n");
    return 2;
  }

  gpc::inference::Forest forest;
  gpc::inference::InferenceSettings settings =
      gpc::inference::InferenceSettings()
          .builder()
          .gradientThreshold(gradThresh)
          .verticalTolerance(vertTol)
          .dispHigh(dispHigh)
          .epipolarMode(epipolar)
          .useHashtable(useHashtable);

  // Width-specific mask from the padded column count, exactly like
  // samples/sparsematch.cpp:42.
  gpc::inference::Forest::FilterMask fm =
      forest.readForest(forestPath, simg.cols(), simg.rows());

  gpc::inference::Forest::PreprocessedImage simgP =
      forest.preprocessImage(simg, settings);
  gpc::inference::Forest::PreprocessedImage timgP =
      forest.preprocessImage(timg, settings);

  std::vector<ndb::Support> supp =
      forest.rectifiedMatch(simgP, timgP, fm, settings);

  std::FILE* f = std::fopen(outPath.c_str(), "w");
  if (!f) {
    std::fprintf(stderr, "refmatch: cannot open %s\n", outPath.c_str());
    return 2;
  }
  for (const ndb::Support& s : supp)
    std::fprintf(f, "%d %d %d\n", s.x, s.y, (int)s.d);
  std::fclose(f);
  if (argc == 11) {
    // the reference sample's own visualization + PNG write
    // (samples/sparsematch.cpp:61-62)
    ndb::Buffer<ndb::RGBColor> renderDisp =
        ndb::getDisparityVisualization(simg, supp);
    renderDisp.writePNGRGB(argv[10]);
  }
  std::fprintf(stderr, "refmatch: candL=%zu candR=%zu matches=%zu\n",
               simgP.mask.size(), timgP.mask.size(), supp.size());
  return 0;
}
