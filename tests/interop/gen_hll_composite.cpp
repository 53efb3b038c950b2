// Composite-estimator parity fixtures (test tooling only — NOT the engine).
//
// Sweeps hll_sketch across every tabled lg_k (4..21) and a range of fill
// levels, including UNIONED sketches (the out-of-order regime where the
// reference itself answers with the composite estimator), and records for
// each: the HLL_8 serialized state, get_composite_estimate(), and the
// 2-sigma bounds. tests/test_hll_composite_parity.py re-reads each blob
// with the engine's deserializer and asserts the engine's
// _composite_estimate reproduces the reference's value to 1e-12 — pinning
// the cubic-interpolation / harmonic-linear-counting / crossover logic,
// not just the raw estimate.
//
// Usage: ./gen_hll_composite <outdir>   (writes blobs + manifest.jsonl)

#include <cstdint>
#include <fstream>
#include <iomanip>
#include <iostream>
#include <sstream>
#include <string>

#include "hll.hpp"

using namespace datasketches;

static std::string outdir;

template <typename Bytes>
static void write_blob(const std::string& name, const Bytes& b) {
  std::ofstream f(outdir + "/" + name, std::ios::binary);
  f.write(reinterpret_cast<const char*>(b.data()), b.size());
}

static std::string fmt(double v) {
  std::ostringstream o;
  o << std::setprecision(17) << v;
  return o.str();
}

static void emit(std::ofstream& man, const std::string& file, int lgk,
                 uint64_t n, bool merged, const hll_sketch& sk) {
  man << "{\"file\": \"" << file << "\", \"lgk\": " << lgk
      << ", \"n\": " << n << ", \"merged\": " << (merged ? "true" : "false")
      << ", \"composite\": " << fmt(sk.get_composite_estimate())
      << ", \"estimate\": " << fmt(sk.get_estimate())
      << ", \"lb2\": " << fmt(sk.get_lower_bound(2))
      << ", \"ub2\": " << fmt(sk.get_upper_bound(2)) << "}\n";
}

int main(int argc, char** argv) {
  if (argc != 2) { std::cerr << "usage: gen_hll_composite <dir>\n"; return 2; }
  outdir = argv[1];
  std::ofstream man(outdir + "/manifest.jsonl");

  for (int lgk = 4; lgk <= 21; lgk++) {
    const uint64_t k = 1ULL << lgk;
    // fill levels bracketing every estimator regime: sparse (linear
    // counting), the crossover window (~0.64k..3k), and deep saturation
    // (pure interpolated raw / above-table extrapolation)
    const uint64_t ns[] = {k / 4, k, 3 * k, 10 * k, 100 * k};
    for (uint64_t n : ns) {
      hll_sketch sk(lgk, HLL_8);
      for (uint64_t i = 0; i < n; i++) sk.update(static_cast<uint64_t>(i * 0x9E3779B97F4A7C15ULL));
      std::string file = "hllc_lgk" + std::to_string(lgk) + "_n" +
                         std::to_string(n) + ".sk";
      write_blob(file, sk.serialize_compact());
      emit(man, file, lgk, n, false, sk);
    }
    // a unioned (out-of-order) sketch: the regime where get_estimate()
    // itself IS the composite estimate
    hll_union u(lgk);
    for (int part = 0; part < 3; part++) {
      hll_sketch sk(lgk, HLL_8);
      for (uint64_t i = 0; i < 2 * k; i++)
        sk.update(static_cast<uint64_t>((i * 3 + part) * 0xC2B2AE3D27D4EB4FULL));
      u.update(sk);
    }
    hll_sketch merged = u.get_result(HLL_8);
    std::string file = "hllc_lgk" + std::to_string(lgk) + "_merged.sk";
    write_blob(file, merged.serialize_compact());
    emit(man, file, lgk, 6 * k, true, merged);
  }
  std::cout << "done\n";
  return 0;
}
