// CPC confidence-bound parity fixtures (test tooling only — NOT the engine).
//
// Builds real cpc_sketch instances — stream-built (HIP regime) and
// union-merged (ICON regime) — serializes each, and records
// get_estimate / get_lower_bound / get_upper_bound at kappa 1..3.
// tests/test_cpc_icon_parity.py re-reads each blob with the engine's
// deserializer and must reproduce every value to 1e-12.
//
// Usage: ./gen_cpc_bounds <outdir>

#include <cstdint>
#include <fstream>
#include <iomanip>
#include <iostream>
#include <string>

#include "cpc_sketch.hpp"
#include "cpc_union.hpp"

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
                 uint64_t n, bool merged, const cpc_sketch& sk) {
  man << "{\"file\": \"" << file << "\", \"lgk\": " << lgk
      << ", \"n\": " << n << ", \"merged\": " << (merged ? "true" : "false")
      << ", \"estimate\": " << fmt(sk.get_estimate());
  for (int kappa = 1; kappa <= 3; kappa++) {
    man << ", \"lb" << kappa << "\": " << fmt(sk.get_lower_bound(kappa))
        << ", \"ub" << kappa << "\": " << fmt(sk.get_upper_bound(kappa));
  }
  man << "}\n";
}

int main(int argc, char** argv) {
  if (argc != 2) { std::cerr << "usage: gen_cpc_bounds <dir>\n"; return 2; }
  outdir = argv[1];
  std::ofstream man(outdir + "/manifest.jsonl");

  for (int lgk : {4, 8, 11, 14, 16}) {
    const uint64_t k = 1ULL << lgk;
    for (uint64_t n : {3 * k / 4, 2 * k, 10 * k, 100 * k}) {
      // stream-built: HIP regime
      cpc_sketch sk(lgk);
      for (uint64_t i = 0; i < n; i++)
        sk.update(static_cast<uint64_t>(i * 0x9E3779B97F4A7C15ULL));
      std::string file = "cpcb_lgk" + std::to_string(lgk) + "_n" +
                         std::to_string(n) + "_hip.sk";
      auto bytes = sk.serialize();
      write_blob(file, bytes);
      emit(man, file, lgk, n, false, sk);

      // union-merged: ICON regime (HIP registers invalidated)
      cpc_union u(lgk);
      for (int part = 0; part < 3; part++) {
        cpc_sketch s(lgk);
        for (uint64_t i = part; i < n; i += 3)
          s.update(static_cast<uint64_t>(i * 0x9E3779B97F4A7C15ULL));
        u.update(s);
      }
      cpc_sketch merged = u.get_result();
      file = "cpcb_lgk" + std::to_string(lgk) + "_n" + std::to_string(n) +
             "_merged.sk";
      auto mbytes = merged.serialize();
      write_blob(file, mbytes);
      emit(man, file, lgk, n, true, merged);
    }
  }
  std::cout << "done\n";
  return 0;
}
