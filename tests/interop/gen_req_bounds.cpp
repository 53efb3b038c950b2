// REQ rank-confidence-bound parity fixtures (test tooling only).
//
// Builds req_sketch<float> instances across k / n / hra, serializes
// each, and records get_rank_lower_bound / get_rank_upper_bound at a
// grid of ranks and num_std_dev 1..2 (plus num_levels, which the bound
// law depends on). tests/test_req_bounds_parity.py re-reads each blob
// with the engine's deserializer and must reproduce every bound to
// 1e-12.
//
// Usage: ./gen_req_bounds <outdir>

#include <cstdint>
#include <fstream>
#include <iomanip>
#include <iostream>
#include <string>

#include "req_sketch.hpp"

using namespace datasketches;

static std::string outdir;

static std::string fmt(double v) {
  std::ostringstream o;
  o << std::setprecision(17) << v;
  return o.str();
}

int main(int argc, char** argv) {
  if (argc != 2) { std::cerr << "usage: gen_req_bounds <dir>\n"; return 2; }
  outdir = argv[1];
  std::ofstream man(outdir + "/manifest.jsonl");
  const double ranks[] = {0.01, 0.1, 0.5, 0.9, 0.99, 0.999};

  for (uint16_t k : {12, 50, 100}) {
    for (bool hra : {true, false}) {
      for (uint64_t n : {100ULL, 5000ULL, 200000ULL}) {
        req_sketch<float> sk(k, hra);
        for (uint64_t i = 0; i < n; i++)
          sk.update(static_cast<float>((i * 2654435761ULL) % 1000003ULL));
        std::string file = "reqb_k" + std::to_string(k) +
                           (hra ? "_hra" : "_lra") + "_n" + std::to_string(n) +
                           ".sk";
        auto bytes = sk.serialize();
        std::ofstream f(outdir + "/" + file, std::ios::binary);
        f.write(reinterpret_cast<const char*>(bytes.data()), bytes.size());
        man << "{\"file\": \"" << file << "\", \"k\": " << k
            << ", \"hra\": " << (hra ? "true" : "false") << ", \"n\": " << n
            << ", \"bounds\": [";
        bool first = true;
        for (double r : ranks) {
          for (int sd = 1; sd <= 2; sd++) {
            if (!first) man << ", ";
            first = false;
            man << "[" << fmt(r) << ", " << sd << ", "
                << fmt(sk.get_rank_lower_bound(r, sd)) << ", "
                << fmt(sk.get_rank_upper_bound(r, sd)) << "]";
          }
        }
        man << "]}\n";
      }
    }
  }
  std::cout << "done\n";
  return 0;
}
