// reftrain: differential-test driver for the TRAINING semantics that calls
// the UNMODIFIED reference functions (Fern::evalSplit / markSplitSamples /
// resetMarkOnSamples, Feature::loadAllTriplets — included read-only from
// /root/reference/lib; nothing copied) with externally injected hyperplane
// candidates, and prints the oracle trainfern line format:
//
//   level i j tau  tp fp fn (unmasked)  score  tp fp fn tot (masked)
//
// The reference's Fern::train cannot be diffed end-to-end (it draws
// candidates from an unseeded std::mt19937, Feature.hpp:113-114); this
// driver keeps the reference's own scoring/marking code in the loop and
// injects the same candidate list the oracle gets, so the SEMANTICS —
// evalSplit's TP/FP/FN classification (Fern.hpp:209-262), the hmean
// selection rule, and markSplitSamples' prefix-excluding mark
// (Fern.hpp:271-291,357) — are differentially pinned to the real code.
//
// One knowing deviation from Fern::train's internals, matching the oracle
// instead: selection tracking uses a double maxScore (the reference keeps a
// `float maxScore`, Fern.hpp:315, which truncates each new best; scores
// closer than float epsilon could tie-break differently there).
//
// Usage (same arity as `oracle trainfern`):
//   reftrain <triplets.bin> <cands.txt> <depth> <taulo> <tauhi> <w1>
//            <onlyNonSplit 0/1> <out.txt>

#include <cstdio>
#include <cstdlib>
#include <fstream>
#include <string>
#include <vector>

// the real reference header tree, in the include order training.hpp uses
// (Feature.hpp calls ndb::box without including filter.hpp itself, and
// buffer.hpp writes bare `cout`, relying on the consumer's
// `using namespace std` — exactly how the reference's own TUs set it up)
#include <iostream>
using namespace std;  // NOLINT — required by the unmodified reference headers
#include "gpc/buffer.hpp"
#include "gpc/filter.hpp"
#include "gpc/Fern.hpp"

int main(int argc, char** argv) {
  if (argc != 9) {
    std::fprintf(stderr,
                 "usage: reftrain <triplets.bin> <cands.txt> <depth> <taulo> "
                 "<tauhi> <w1> <onlyNonSplit> <out.txt>\n");
    return 1;
  }
  std::string tripletPath = argv[1];
  std::string candPath = argv[2];
  int depth = std::atoi(argv[3]);
  int taulo = std::atoi(argv[4]);
  int tauhi = std::atoi(argv[5]);
  double w1 = std::atof(argv[6]);
  bool onlyNonSplit = std::atoi(argv[7]) != 0;
  std::string outPath = argv[8];

  gpc::training::Feature feat;
  std::vector<gpc::training::Feature::GPCPatchTriplet> data =
      feat.loadAllTriplets(tripletPath);
  if (data.empty()) {
    std::fprintf(stderr, "reftrain: no triplets loaded\n");
    return 2;
  }
  // pristine copy for unmasked diagnostic stats (split flags never set)
  std::vector<gpc::training::Feature::GPCPatchTriplet> data0 = data;

  std::ifstream cf(candPath);
  std::vector<std::vector<std::pair<int, int>>> cands(depth);
  int level, ci, cj;
  while (cf >> level >> ci >> cj) {
    if (level < 0 || level >= depth) {
      std::fprintf(stderr, "reftrain: candidate level %d out of range\n",
                   level);
      return 2;
    }
    cands[level].emplace_back(ci, cj);
  }

  gpc::training::FernSettings fs(depth, 0);
  gpc::training::Fern fern(fs);
  gpc::training::OptimizerSettings opt(taulo, tauhi, /*numResamples=*/0,
                                       onlyNonSplit, w1);

  std::vector<gpc::training::Feature::params> params(depth);
  if (onlyNonSplit) fern.resetMarkOnSamples(data);

  std::ofstream out(outPath);
  for (int l = 0; l < depth; l++) {
    double maxScore = 0.0;
    gpc::training::Feature::params best;  // defaults i=j=tau=0
    gpc::training::splitStats s;
    for (const std::pair<int, int>& c : cands[l]) {
      params[l].i = c.first;
      params[l].j = c.second;
      for (int tau = taulo; tau < tauhi; tau++) {
        params[l].tau = tau;
        fern.evalSplit(data, params, fs, opt, l, s);
        if (s.hmean > maxScore) {
          best = params[l];
          maxScore = s.hmean;
        }
      }
    }
    params[l] = best;
    // masked stats the selection actually used (pre-mark), via the
    // reference's own evalSplit on the flag-carrying dataset
    gpc::training::splitStats ex;
    fern.evalSplit(data, params, fs, opt, l, ex);
    if (onlyNonSplit) fern.markSplitSamples(data, params, l);  // Fern.hpp:357
    // unmasked diagnostics on the pristine copy
    gpc::training::splitStats su;
    fern.evalSplit(data0, params, fs, opt, l, su);
    out << l << " " << best.i << " " << best.j << " " << best.tau << " "
        << su.tp << " " << su.fp << " " << su.fn << " " << maxScore << " "
        << ex.tp << " " << ex.fp << " " << ex.fn << " " << ex.tot << "\n";
  }
  return 0;
}
