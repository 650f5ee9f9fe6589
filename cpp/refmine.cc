// refmine: differential-test driver for the MINING semantics that calls the
// UNMODIFIED reference datasource code (SintelOpticalFlow::getFlow /
// getOcclusion / getInvalid / getGroundTruthMatches and
// Feature::extractAllTriplets / storeAllTriplets — included read-only from
// /root/reference/lib; nothing copied) on a caller-built fixture tree laid
// out like the Sintel dataset.
//
// The reference's mining RNG is an unseeded std::mt19937
// (SintelOpticalFlow.hpp:497-498), so the accepted keypoint SET is not
// byte-reproducible — what IS differentially pinned is every semantic rule
// each accepted triplet must satisfy, checked on the Python side
// (tests/test_reference_binary.py):
//   * the .flo byte layout + the Eigen (x, y)-indexed flow lookup: the
//     emitted target must equal src + round(flow at src) under OUR reader,
//   * round() halving behavior (fixture flows include exact .5 values),
//   * isSafePatchCenter margins for src, tar and neg,
//   * the negative annulus geometry (per-axis offset in [lo, hi], sign != 0
//     — the flow path's sig() redraws 0, SintelOpticalFlow.hpp:539-544),
//   * the small-motion rejection ramp (fixture regions with |d| >= 15 must
//     all be accepted; a zero-flow fixture region must be accepted at ~0.5),
//   * the stored triplet records: 3x729-byte X-major patches of the
//     box-blurred images, byte-identical to our extractor at the same
//     keypoints.
//
// Usage:
//   refmine <sintel_base> <numKpts> <radiusLo> <radiusHi>
//           <kpts_out.txt> <trips_out.bin>
//
// <sintel_base> must contain training/{clean,final,flow,occlusions,invalid}/
// alley_1/ with frame_0001/0002 files (the constructor counts clean PNGs and
// the default scene is alley_1).  Mines pair (1, 2) like the first iteration
// of extractTrainingData (SintelOpticalFlow.hpp:127-151).

#include <cstdio>
#include <cstdlib>
#include <fstream>
#include <string>
#include <vector>

#include <iostream>
using namespace std;  // NOLINT — required by the unmodified reference headers
#include "gpc/buffer.hpp"
#include "gpc/filter.hpp"
#include "gpc/Feature.hpp"
// the mining entry points (getFlow/getOcclusion/getGroundTruthMatches) sit
// in a private section (SintelOpticalFlow.hpp:191); the only public entry,
// extractTrainingData, hides the keypoint lists this differential needs.
// Standard test-driver access hack, confined to this one include — the
// reference file itself is untouched
#define private public
#include "gpc/SintelOpticalFlow.hpp"
#undef private

int main(int argc, char** argv) {
  if (argc != 7) {
    std::fprintf(stderr,
                 "usage: refmine <sintel_base> <numKpts> <radiusLo> "
                 "<radiusHi> <kpts_out.txt> <trips_out.bin>\n");
    return 1;
  }
  std::string base = argv[1];
  int numKpts = std::atoi(argv[2]);
  int radiusLo = std::atoi(argv[3]);
  int radiusHi = std::atoi(argv[4]);
  std::string kptsOut = argv[5];
  std::string tripsOut = argv[6];

  gpc::datasource::SintelOpticalFlow ds(base);
  Eigen::MatrixXd u, v;
  ndb::Buffer<uint8_t> oSrc, oTar, invSrc, invTar, imgL, imgR;
  int err = 0;
  err |= ds.getFlow(1, u, v);
  err |= ds.getBW(1, imgL, imgR);
  err |= ds.getOcclusion(1, oSrc);
  err |= ds.getOcclusion(2, oTar);
  err |= ds.getInvalid(1, invSrc);
  err |= ds.getInvalid(2, invTar);
  if (err) {
    std::fprintf(stderr, "refmine: fixture files missing under %s\n",
                 base.c_str());
    return 2;
  }

  std::vector<ndb::Point> kptsL, kptsR, kptsN;
  ds.getGroundTruthMatches(u, v, oSrc, oTar, invSrc, invTar, numKpts,
                           radiusLo, radiusHi, kptsL, kptsR, kptsN);

  std::ofstream kf(kptsOut);
  for (size_t i = 0; i < kptsL.size(); i++) {
    kf << kptsL[i].x << " " << kptsL[i].y << " " << kptsR[i].x << " "
       << kptsR[i].y << " " << kptsN[i].x << " " << kptsN[i].y << "\n";
  }
  kf.close();

  gpc::training::Feature feat;
  std::vector<gpc::training::Feature::GPCPatchTriplet> trips;
  feat.extractAllTriplets(imgL, imgR, kptsL, kptsR, kptsN, trips);
  feat.storeAllTriplets(trips, tripsOut);
  std::printf("refmine: %zu keypoints, %zu triplets\n", kptsL.size(),
              trips.size());
  return 0;
}
