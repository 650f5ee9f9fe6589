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
//   refmine flow   <sintel_base> <numKpts> <radiusLo> <radiusHi>
//                  <kpts_out.txt> <trips_out.bin>
//   refmine stereo <sintel_base> <numKpts> <radiusLo> <radiusHi>
//                  <kpts_out.txt> <trips_out.bin>
//
// flow: <sintel_base> must contain training/{clean,flow,occlusions,invalid}/
// alley_1/ with frame_0001/0002 files (the constructor counts clean PNGs and
// the default scene is alley_1).  Mines pair (1, 2) like the first iteration
// of extractTrainingData (SintelOpticalFlow.hpp:127-151).
//
// stereo: <sintel_base> must contain training/{clean_left,clean_right,
// disparities,occlusions,outofframe}/alley_1/ with frame_0001 files.  Mines
// frame 1 like SintelStereo::extractTrainingData (SintelStereo.hpp:120-146).
// Stereo-specific reference quirks the Python side accounts for: the
// rejection ramp uses INTEGER division (zero for every d != 0,
// SintelStereo.hpp:427) and the negative's signum can emit 0 on either axis
// (the sig() redraw lambda is defined but NOT used, SintelStereo.hpp:449-450).

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
#include "gpc/SintelStereo.hpp"
#undef private

static void writeOutputs(const std::string& kptsOut,
                         const std::string& tripsOut,
                         std::vector<ndb::Point>& kptsL,
                         std::vector<ndb::Point>& kptsR,
                         std::vector<ndb::Point>& kptsN,
                         ndb::Buffer<uint8_t>& imgL,
                         ndb::Buffer<uint8_t>& imgR) {
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
}

int main(int argc, char** argv) {
  if (argc != 8 || (std::string(argv[1]) != "flow" &&
                    std::string(argv[1]) != "stereo")) {
    std::fprintf(stderr,
                 "usage: refmine <flow|stereo> <sintel_base> <numKpts> "
                 "<radiusLo> <radiusHi> <kpts_out.txt> <trips_out.bin>\n");
    return 1;
  }
  std::string mode = argv[1];
  std::string base = argv[2];
  int numKpts = std::atoi(argv[3]);
  int radiusLo = std::atoi(argv[4]);
  int radiusHi = std::atoi(argv[5]);
  std::string kptsOut = argv[6];
  std::string tripsOut = argv[7];

  std::vector<ndb::Point> kptsL, kptsR, kptsN;
  if (mode == "flow") {
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
    ds.getGroundTruthMatches(u, v, oSrc, oTar, invSrc, invTar, numKpts,
                             radiusLo, radiusHi, kptsL, kptsR, kptsN);
    writeOutputs(kptsOut, tripsOut, kptsL, kptsR, kptsN, imgL, imgR);
  } else {
    gpc::datasource::SintelStereo ds(base);
    ndb::Buffer<uint8_t> occ, oof, imgL, imgR;
    ndb::RGBBuffer disp;
    int err = 0;
    err |= ds.getBW(1, imgL, imgR);
    err |= ds.getDisparity(1, disp);
    err |= ds.getOcclusion(1, occ);
    err |= ds.getInvalid(1, oof);
    if (err) {
      std::fprintf(stderr, "refmine: fixture files missing under %s\n",
                   base.c_str());
      return 2;
    }
    ds.getGroundTruthMatches(disp, oof, occ, numKpts, radiusLo, radiusHi,
                             kptsL, kptsR, kptsN);
    writeOutputs(kptsOut, tripsOut, kptsL, kptsR, kptsN, imgL, imgR);
  }
  return 0;
}
