// ICON-estimator parity fixtures (test tooling only — NOT the engine).
//
// Sweeps the reference's compute_icon_estimate over every tabled lg_k
// (4..26) and coupon counts covering both regimes (degree-19 polynomial
// below the 5.6/5.7·k threshold, exponential approximation above) plus
// the tiny-c corner cases, and emits (lg_k, c, icon) JSON lines.
// tests/test_cpc_icon_parity.py asserts the engine's icon_estimate
// reproduces each value to 1e-12.
//
// Usage: ./gen_cpc_icon > manifest.jsonl

#include <cstdint>
#include <iomanip>
#include <iostream>
#include <vector>

#include "icon_estimator.hpp"

int main() {
  std::cout << std::setprecision(17);
  for (int lgk = 4; lgk <= 26; lgk++) {
    const uint64_t k = 1ULL << lgk;
    std::vector<uint64_t> cs = {0, 1, 2, 3, k / 4, k / 2, k, 2 * k,
                                4 * k, 5 * k, 6 * k, 8 * k, 16 * k};
    for (uint64_t c : cs) {
      const double est = datasketches::compute_icon_estimate(
          static_cast<uint8_t>(lgk), static_cast<uint32_t>(c));
      std::cout << "{\"lgk\": " << lgk << ", \"c\": " << c
                << ", \"icon\": " << est << "}\n";
    }
  }
  return 0;
}
