// Reference-fixture generator (test harness only — NOT part of the engine).
//
// Compiles against the READ-ONLY apache/datasketches-cpp headers in
// /root/reference and serializes a battery of sketches across every wire
// family this engine claims byte compatibility with.  Each blob is written
// to the output directory together with a manifest.jsonl line recording the
// construction parameters and the reference implementation's own query
// answers (estimates, quantiles, bounds).  The pytest side
// (tests/test_reference_interop.py) then deserializes each blob with the
// engine's from-scratch Python serde and asserts the engine's answers match
// the reference's — converting "byte-compatible" from a claim into evidence
// produced by the reference implementation itself.
//
// Everything here is original harness code: it *calls* the reference's
// public API exactly like the reference's own unit tests do; it copies no
// implementation.  random_utils::override_seed pins the reference's RNG so
// NOTE: the reference's random compaction offsets (KLL/REQ/classic,
// var_opt/ebpps eviction, density halving) draw from its global RNG,
// so regeneration is NOT byte-stable run-to-run for those families.
// When adding a family, run into a scratch dir and merge ONLY the new
// blobs + manifest rows; each committed blob is consistent with the
// committed manifest row from the same run, which is what the tests
// compare against.
//
// Build:  tests/interop/build.sh   (g++ -O2 -std=c++17, ~30 s)
// Run:    ./gen_fixtures <outdir>

#include <cstdint>
#include <fstream>
#include <iomanip>
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

#include "common_defs.hpp"

#include "theta_sketch.hpp"
#include "hll.hpp"
#include "kll_sketch.hpp"
#include "quantiles_sketch.hpp"
#include "req_sketch.hpp"
#include "tdigest.hpp"
#include "frequent_items_sketch.hpp"
#include "tuple_sketch.hpp"
#include "array_of_doubles_sketch.hpp"
#include "array_of_strings_sketch.hpp"
#include "var_opt_sketch.hpp"
#include "ebpps_sketch.hpp"
#include "count_min.hpp"
#include "bloom_filter.hpp"
#include "cpc_sketch.hpp"
#include "density_sketch.hpp"

using namespace datasketches;

static std::string g_outdir;
static std::ofstream g_manifest;

static std::string fmt(double v) {
  std::ostringstream os;
  os << std::setprecision(17) << v;
  return os.str();
}

// Tiny append-only JSON builder: enough for flat {str: num|str|[nums]} rows.
struct Row {
  std::ostringstream os;
  bool first = true;
  explicit Row(const std::string& file, const std::string& family) {
    os << "{\"file\": \"" << file << "\", \"family\": \"" << family << "\"";
    first = false;
  }
  Row& num(const std::string& k, double v) {
    os << ", \"" << k << "\": " << fmt(v);
    return *this;
  }
  Row& str(const std::string& k, const std::string& v) {
    os << ", \"" << k << "\": \"" << v << "\"";
    return *this;
  }
  Row& arr(const std::string& k, const std::vector<double>& vs) {
    os << ", \"" << k << "\": [";
    for (size_t i = 0; i < vs.size(); i++) os << (i ? ", " : "") << fmt(vs[i]);
    os << "]";
    return *this;
  }
  void emit() { g_manifest << os.str() << "}\n"; }
};

template <typename Bytes>
static void write_blob(const std::string& file, const Bytes& bytes) {
  std::ofstream f(g_outdir + "/" + file, std::ios::binary);
  f.write(reinterpret_cast<const char*>(bytes.data()), bytes.size());
}

// Deterministic value stream: a fixed-increment Weyl sequence so quantile
// inputs are spread over (0, 1) without using any RNG.
static double weyl(uint64_t i) {
  return std::fmod(0.6180339887498949 * static_cast<double>(i + 1), 1.0);
}

static const std::vector<double> RANKS = {0.1, 0.25, 0.5, 0.75, 0.9};

// ---------------------------------------------------------------- theta
static void gen_theta() {
  for (uint64_t n : {0ULL, 1ULL, 1000ULL, 100000ULL}) {
    auto upd = update_theta_sketch::builder().set_lg_k(12).build();
    for (uint64_t i = 0; i < n; i++) upd.update(i);
    auto c = upd.compact();
    std::string file = "theta_lgk12_n" + std::to_string(n) + ".sk";
    write_blob(file, c.serialize());
    Row(file, "theta")
        .num("n", (double)n)
        .num("lgk", 12)
        .num("estimate", c.get_estimate())
        .num("theta", c.get_theta())
        .num("num_retained", c.get_num_retained())
        .num("lb2", c.get_lower_bound(2))
        .num("ub2", c.get_upper_bound(2))
        .emit();
    // v4 compressed form of the same sketch
    std::ostringstream os(std::ios::binary);
    c.serialize_compressed(os);
    std::string s = os.str();
    std::string file4 = "theta_lgk12_n" + std::to_string(n) + "_v4.sk";
    std::ofstream f(g_outdir + "/" + file4, std::ios::binary);
    f.write(s.data(), s.size());
    Row(file4, "theta")
        .num("n", (double)n)
        .num("lgk", 12)
        .num("estimate", c.get_estimate())
        .num("theta", c.get_theta())
        .num("num_retained", c.get_num_retained())
        .emit();
  }
}

// ------------------------------------------------------------------ hll
static void gen_hll() {
  const std::pair<target_hll_type, const char*> types[] = {
      {HLL_4, "hll4"}, {HLL_6, "hll6"}, {HLL_8, "hll8"}};
  for (auto& [tt, tname] : types) {
    for (uint64_t n : {0ULL, 1ULL, 4ULL, 300ULL, 5000ULL}) {
      hll_sketch sk(11, tt);
      for (uint64_t i = 0; i < n; i++) sk.update(i);
      for (const char* mode : {"compact", "updatable"}) {
        std::string file = std::string(tname) + "_lgk11_n" + std::to_string(n) +
                           "_" + mode + ".sk";
        write_blob(file, std::string(mode) == std::string("compact")
                             ? sk.serialize_compact()
                             : sk.serialize_updatable());
        Row(file, "hll")
            .num("n", (double)n)
            .num("lgk", 11)
            .str("hll_type", tname)
            .str("mode", mode)
            .num("estimate", sk.get_estimate())
            .num("lb2", sk.get_lower_bound(2))
            .num("ub2", sk.get_upper_bound(2))
            .emit();
      }
    }
  }
}

// ------------------------------------------------------------------ kll
static void gen_kll() {
  for (uint64_t n : {0ULL, 1ULL, 10ULL, 1000ULL, 100000ULL}) {
    kll_sketch<double> sk(200);
    for (uint64_t i = 0; i < n; i++) sk.update(weyl(i));
    std::string file = "kll_double_k200_n" + std::to_string(n) + ".sk";
    write_blob(file, sk.serialize());
    Row r(file, "kll_double");
    r.num("n", (double)n).num("k", 200);
    if (n > 0) {
      std::vector<double> qs;
      for (double rk : RANKS) qs.push_back(sk.get_quantile(rk));
      r.arr("quantiles", qs)
          .num("min", sk.get_min_item())
          .num("max", sk.get_max_item())
          .num("rank_of_half", sk.get_rank(0.5))
          .num("num_retained", sk.get_num_retained());
    }
    r.emit();
  }
  for (uint64_t n : {0ULL, 1ULL, 1000ULL, 100000ULL}) {
    kll_sketch<float> sk(200);
    for (uint64_t i = 0; i < n; i++) sk.update((float)weyl(i));
    std::string file = "kll_float_k200_n" + std::to_string(n) + ".sk";
    write_blob(file, sk.serialize());
    Row r(file, "kll_float");
    r.num("n", (double)n).num("k", 200);
    if (n > 0) {
      std::vector<double> qs;
      for (double rk : RANKS) qs.push_back(sk.get_quantile(rk));
      r.arr("quantiles", qs)
          .num("min", sk.get_min_item())
          .num("max", sk.get_max_item())
          .num("num_retained", sk.get_num_retained());
    }
    r.emit();
  }
  for (uint64_t n : {1ULL, 100ULL, 10000ULL}) {
    kll_sketch<std::string> sk(200);
    for (uint64_t i = 0; i < n; i++) {
      std::ostringstream os;
      os << "item_" << std::setw(6) << std::setfill('0') << ((i * 7919) % n);
      sk.update(os.str());
    }
    std::string file = "kll_string_k200_n" + std::to_string(n) + ".sk";
    write_blob(file, sk.serialize());
    Row(file, "kll_string")
        .num("n", (double)n)
        .num("k", 200)
        .str("median", sk.get_quantile(0.5))
        .str("min", sk.get_min_item())
        .str("max", sk.get_max_item())
        .num("num_retained", sk.get_num_retained())
        .emit();
  }
}

// ----------------------------------------------------- classic quantiles
static void gen_classic() {
  for (uint64_t n : {0ULL, 1ULL, 10ULL, 1000ULL, 10000ULL}) {
    quantiles_sketch<double> sk(128);
    for (uint64_t i = 0; i < n; i++) sk.update(weyl(i));
    std::string file = "classic_k128_n" + std::to_string(n) + ".sk";
    write_blob(file, sk.serialize());
    Row r(file, "classic");
    r.num("n", (double)n).num("k", 128);
    if (n > 0) {
      std::vector<double> qs;
      for (double rk : RANKS) qs.push_back(sk.get_quantile(rk));
      r.arr("quantiles", qs)
          .num("min", sk.get_min_item())
          .num("max", sk.get_max_item())
          .num("num_retained", sk.get_num_retained());
    }
    r.emit();
  }
}

// ------------------------------------------------------------------ req
static void gen_req() {
  for (bool hra : {true, false}) {
    for (uint64_t n : {0ULL, 1ULL, 1000ULL, 100000ULL}) {
      req_sketch<float> sk(12, hra);
      for (uint64_t i = 0; i < n; i++) sk.update((float)weyl(i));
      std::string file = std::string("req_float_k12_") + (hra ? "hra" : "lra") +
                         "_n" + std::to_string(n) + ".sk";
      write_blob(file, sk.serialize());
      Row r(file, "req");
      r.num("n", (double)n).num("k", 12).num("hra", hra ? 1 : 0);
      if (n > 0) {
        std::vector<double> qs;
        for (double rk : RANKS) qs.push_back(sk.get_quantile(rk));
        r.arr("quantiles", qs)
            .num("min", sk.get_min_item())
            .num("max", sk.get_max_item())
            .num("rank_of_half", sk.get_rank(0.5f))
            .num("num_retained", sk.get_num_retained());
      }
      r.emit();
    }
  }
}

// -------------------------------------------------------------- tdigest
static void gen_tdigest() {
  for (uint64_t n : {0ULL, 1ULL, 1000ULL, 10000ULL}) {
    tdigest_double td(100);
    for (uint64_t i = 0; i < n; i++) td.update(weyl(i));
    std::string file = "tdigest_k100_n" + std::to_string(n) + ".sk";
    write_blob(file, td.serialize());
    Row r(file, "tdigest");
    r.num("n", (double)n).num("k", 100);
    if (n > 0) {
      std::vector<double> qs;
      for (double rk : RANKS) qs.push_back(td.get_quantile(rk));
      // value-space probes (data is weyl ⊂ (0,1)) for exact rank parity
      std::vector<double> probes = {0.1, 0.3, 0.5, 0.7, 0.9};
      std::vector<double> rks;
      for (double p : probes) rks.push_back(td.get_rank(p));
      r.arr("quantiles", qs)
          .arr("rank_probes", probes)
          .arr("ranks", rks)
          .num("min", td.get_min_value())
          .num("max", td.get_max_value())
          .num("total_weight", (double)td.get_total_weight());
    }
    r.emit();
  }
}

// ------------------------------------------------------- frequent items
static void gen_fi() {
  {
    frequent_items_sketch<std::string> sk(6);
    for (uint64_t i = 0; i < 5000; i++) {
      sk.update("heavy_" + std::to_string(i % 5));          // 1000 each
      if (i % 10 == 0) sk.update("light_" + std::to_string(i)); // singletons
    }
    std::string file = "fi_string_lgk6.sk";
    write_blob(file, sk.serialize());
    Row(file, "fi_string")
        .num("total_weight", (double)sk.get_total_weight())
        .num("max_error", (double)sk.get_maximum_error())
        .num("est_heavy_0", (double)sk.get_estimate("heavy_0"))
        .num("est_heavy_4", (double)sk.get_estimate("heavy_4"))
        .emit();
  }
  {
    frequent_items_sketch<int64_t> sk(6);
    for (uint64_t i = 0; i < 5000; i++) {
      sk.update((int64_t)(i % 5));
      if (i % 10 == 0) sk.update((int64_t)(100 + i));
    }
    std::string file = "fi_int64_lgk6.sk";
    write_blob(file, sk.serialize());
    Row(file, "fi_int64")
        .num("total_weight", (double)sk.get_total_weight())
        .num("max_error", (double)sk.get_maximum_error())
        .num("est_0", (double)sk.get_estimate(0))
        .num("est_4", (double)sk.get_estimate(4))
        .emit();
  }
}

// ---------------------------------------------------------------- tuple
static void gen_tuple() {
  for (uint64_t n : {0ULL, 1ULL, 1000ULL, 20000ULL}) {
    auto upd = update_tuple_sketch<double>::builder().set_lg_k(12).build();
    for (uint64_t i = 0; i < n; i++) upd.update(i, (double)(i % 7));
    auto c = upd.compact();
    double sum = 0;
    for (const auto& e : c) sum += e.second;
    std::string file = "tuple_double_lgk12_n" + std::to_string(n) + ".sk";
    write_blob(file, c.serialize());
    Row(file, "tuple_double")
        .num("n", (double)n)
        .num("lgk", 12)
        .num("estimate", c.get_estimate())
        .num("theta", c.get_theta())
        .num("num_retained", c.get_num_retained())
        .num("summary_sum", sum)
        .emit();
  }
}

// ------------------------------------------------------ array of doubles
static void gen_aod() {
  for (uint64_t n : {0ULL, 1000ULL, 20000ULL}) {
    auto upd = update_array_of_doubles_sketch::builder(3).set_lg_k(12).build();
    std::vector<double> v(3);
    for (uint64_t i = 0; i < n; i++) {
      v[0] = (double)(i % 7); v[1] = 1.0; v[2] = (double)(i % 3);
      upd.update(i, v);
    }
    auto c = upd.compact();
    double sum0 = 0, sum1 = 0, sum2 = 0;
    for (const auto& e : c) { sum0 += e.second[0]; sum1 += e.second[1]; sum2 += e.second[2]; }
    std::string file = "aod3_lgk12_n" + std::to_string(n) + ".sk";
    write_blob(file, c.serialize());
    Row(file, "aod3")
        .num("n", (double)n)
        .num("lgk", 12)
        .num("num_values", 3)
        .num("estimate", c.get_estimate())
        .num("theta", c.get_theta())
        .num("num_retained", c.get_num_retained())
        .num("sum0", sum0)
        .num("sum1", sum1)
        .num("sum2", sum2)
        .emit();
  }
}

// ------------------------------------------------------ array of strings
static void gen_aos() {
  // n=100000 distinct keys >> k=4096 exercises estimation mode + k-min
  // cut; no RNG anywhere in this family, so the fixtures are
  // byte-reproducible (unlike the KLL/REQ compaction-offset families)
  for (uint64_t n : {0ULL, 500ULL, 100000ULL}) {
    auto upd = update_array_of_strings_tuple_sketch<>::builder().set_lg_k(12).build();
    for (uint64_t i = 0; i < n; i++) {
      array_of_strings key(2, "");
      key[0] = "k" + std::to_string(i % 30000);
      key[1] = "g" + std::to_string(i % 7);
      array_of_strings value(2, "");
      value[0] = "v" + std::to_string(i % 1000);
      value[1] = std::to_string(i % 7);
      upd.update(hash_array_of_strings_key(key), value);
    }
    auto c = compact_array_of_strings_sketch(upd);
    size_t total_strings = 0;
    for (const auto& e : c) total_strings += e.second.size();
    std::string file = "aos_lgk12_n" + std::to_string(n) + ".sk";
    write_blob(file, c.serialize(0, default_array_of_strings_serde<>()));
    Row(file, "aos")
        .num("n", (double)n)
        .num("lgk", 12)
        .num("estimate", c.get_estimate())
        .num("theta", c.get_theta())
        .num("num_retained", c.get_num_retained())
        .num("total_strings", (double)total_strings)
        .emit();
  }
}

// -------------------------------------------------------------- var_opt
static void gen_varopt() {
  {
    var_opt_sketch<int64_t> sk(32);
    for (uint64_t i = 0; i < 1000; i++) sk.update((int64_t)i, (double)(i % 10 + 1));
    auto ss = sk.estimate_subset_sum([](int64_t x) { return x % 2 == 0; });
    std::string file = "varopt_int64_k32_n1000.sk";
    write_blob(file, sk.serialize());
    Row(file, "varopt_int64")
        .num("k", 32)
        .num("n", 1000)
        .num("num_samples", (double)sk.get_num_samples())
        .num("subset_even_est", ss.estimate)
        .num("subset_total", ss.total_sketch_weight)
        .emit();
  }
  {
    var_opt_sketch<std::string> sk(16);
    for (uint64_t i = 0; i < 500; i++)
      sk.update("key_" + std::to_string(i), (double)(i % 5 + 1));
    auto ss = sk.estimate_subset_sum([](const std::string&) { return true; });
    std::string file = "varopt_string_k16_n500.sk";
    write_blob(file, sk.serialize());
    Row(file, "varopt_string")
        .num("k", 16)
        .num("n", 500)
        .num("num_samples", (double)sk.get_num_samples())
        .num("subset_total", ss.total_sketch_weight)
        .emit();
  }
}

// ---------------------------------------------------------------- ebpps
static void gen_ebpps() {
  ebpps_sketch<int64_t> sk(50);
  for (uint64_t i = 0; i < 1000; i++) sk.update((int64_t)i, (double)(i % 10 + 1));
  std::string file = "ebpps_int64_k50_n1000.sk";
  write_blob(file, sk.serialize());
  Row(file, "ebpps_int64")
      .num("k", 50)
      .num("n", (double)sk.get_n())
      .num("cumulative_weight", sk.get_cumulative_weight())
      .num("c", sk.get_c())
      .emit();
}

// ------------------------------------------------------------ count-min
static void gen_countmin() {
  count_min_sketch<uint64_t> sk(5, 64);
  for (uint64_t i = 0; i < 10000; i++) sk.update(i % 100, 1 + i % 3);
  std::string file = "countmin_h5_b64.sk";
  write_blob(file, sk.serialize());
  Row(file, "countmin")
      .num("num_hashes", 5)
      .num("num_buckets", 64)
      .num("total_weight", (double)sk.get_total_weight())
      .num("est_key0", (double)sk.get_estimate((uint64_t)0))
      .num("est_key50", (double)sk.get_estimate((uint64_t)50))
      .emit();
}

// ---------------------------------------------------------------- bloom
static void gen_bloom() {
  auto bf = bloom_filter::builder::create_by_size(1 << 14, 7);
  for (uint64_t i = 0; i < 1000; i++) bf.update(i);
  std::string file = "bloom_16k_h7.sk";
  write_blob(file, bf.serialize());
  Row(file, "bloom")
      .num("capacity_bits", (double)bf.get_capacity())
      .num("num_hashes", bf.get_num_hashes())
      .num("bits_used", (double)bf.get_bits_used())
      .num("seed", (double)bf.get_seed())
      .emit();
}

// ------------------------------------------------------------------ cpc
static void gen_cpc() {
  for (uint8_t lgk : {10, 11, 12}) {
    for (uint64_t n : {0ULL, 1ULL, 20ULL, 500ULL, 3000ULL, 100000ULL}) {
      cpc_sketch sk(lgk);
      for (uint64_t i = 0; i < n; i++) sk.update(i);
      std::string file = "cpc_lgk" + std::to_string(lgk) + "_n" +
                         std::to_string(n) + ".sk";
      write_blob(file, sk.serialize());
      Row(file, "cpc")
          .num("n", (double)n)
          .num("lgk", lgk)
          .num("estimate", sk.get_estimate())
          .num("lb2", sk.get_lower_bound(2))
          .num("ub2", sk.get_upper_bound(2))
          .emit();
    }
  }
}

// -------------------------------------------------------------- density
static void gen_density() {
  density_sketch<float> sk(10, 3);
  for (uint64_t i = 0; i < 2000; i++) {
    sk.update(std::vector<float>{(float)weyl(i), (float)weyl(i * 3 + 1),
                                 (float)weyl(i * 7 + 2)});
  }
  std::string file = "density_k10_d3_n2000.sk";
  write_blob(file, sk.serialize());
  Row(file, "density")
      .num("k", 10)
      .num("dim", 3)
      .num("n", (double)sk.get_n())
      .num("num_retained", (double)sk.get_num_retained())
      .num("est_origin", sk.get_estimate(std::vector<float>{0.5f, 0.5f, 0.5f}))
      .emit();
}

int main(int argc, char** argv) {
  if (argc < 2) {
    std::cerr << "usage: gen_fixtures <outdir>\n";
    return 2;
  }
  g_outdir = argv[1];
  random_utils::override_seed(42);  // pin KLL/REQ offsets + var_opt/ebpps draws
  g_manifest.open(g_outdir + "/manifest.jsonl");
  gen_theta();
  gen_hll();
  gen_kll();
  gen_classic();
  gen_req();
  gen_tdigest();
  gen_fi();
  gen_tuple();
  gen_aod();
  gen_aos();
  gen_varopt();
  gen_ebpps();
  gen_countmin();
  gen_bloom();
  gen_cpc();
  gen_density();
  g_manifest.close();
  std::cout << "fixtures written to " << g_outdir << std::endl;
  return 0;
}
