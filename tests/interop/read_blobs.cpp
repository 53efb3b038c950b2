// Reverse-direction interop harness (test tooling only — NOT the engine).
//
// The engine's Python writers produce wire blobs; this program makes the
// READ-ONLY reference implementation in /root/reference deserialize each
// blob, answer queries, and RE-SERIALIZE its parsed state to `<file>.out`.
// The pytest side (tests/test_reference_interop.py, write-path section)
// then re-reads the reference's re-encoding with the engine's own readers
// and asserts state equality — closing the loop
//
//   engine state → engine writer → reference reader → reference writer
//     → engine reader → state'   (must be identical)
//
// with zero tolerance, which proves the engine's WRITE path emits bytes a
// real DataSketches deployment accepts.
//
// Usage: ./read_blobs <dir>
//   reads every file named  <family>__<anything>.bin  in <dir>, where
//   <family> selects the reference type to deserialize with; writes
//   <file>.out and one JSON line per blob to stdout.

#include <cstdint>
#include <dirent.h>
#include <fstream>
#include <iomanip>
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

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
#include "count_min.hpp"
#include "bloom_filter.hpp"
#include "cpc_sketch.hpp"
#include "ebpps_sketch.hpp"
#include "density_sketch.hpp"

using namespace datasketches;

static std::vector<uint8_t> slurp(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  return std::vector<uint8_t>(std::istreambuf_iterator<char>(f), {});
}

template <typename Bytes>
static void dump(const std::string& path, const Bytes& b) {
  std::ofstream f(path, std::ios::binary);
  f.write(reinterpret_cast<const char*>(b.data()), b.size());
}

static std::string fmt(double v) {
  std::ostringstream os;
  os << std::setprecision(17) << v;
  return os.str();
}

int main(int argc, char** argv) {
  if (argc < 2) {
    std::cerr << "usage: read_blobs <dir>\n";
    return 2;
  }
  const std::string dir = argv[1];
  DIR* d = opendir(dir.c_str());
  if (!d) {
    std::cerr << "cannot open " << dir << "\n";
    return 2;
  }
  std::vector<std::string> files;
  while (dirent* e = readdir(d)) {
    std::string name = e->d_name;
    if (name.size() > 4 && name.substr(name.size() - 4) == ".bin") files.push_back(name);
  }
  closedir(d);
  for (const auto& name : files) {
    const std::string fam = name.substr(0, name.find("__"));
    const std::string path = dir + "/" + name;
    const auto buf = slurp(path);
    std::ostringstream row;
    row << "{\"file\": \"" << name << "\"";
    try {
      if (fam == "theta") {
        auto sk = compact_theta_sketch::deserialize(buf.data(), buf.size());
        row << ", \"estimate\": " << fmt(sk.get_estimate())
            << ", \"num_retained\": " << sk.get_num_retained()
            << ", \"theta\": " << fmt(sk.get_theta());
        dump(path + ".out", sk.serialize());
      } else if (fam == "hll") {
        auto sk = hll_sketch::deserialize(buf.data(), buf.size());
        row << ", \"estimate\": " << fmt(sk.get_estimate())
            << ", \"lgk\": " << (int)sk.get_lg_config_k();
        dump(path + ".out", sk.serialize_compact());
      } else if (fam == "klld") {
        auto sk = kll_sketch<double>::deserialize(buf.data(), buf.size());
        row << ", \"n\": " << sk.get_n()
            << ", \"median\": " << fmt(sk.is_empty() ? 0.0 : sk.get_quantile(0.5))
            << ", \"num_retained\": " << sk.get_num_retained();
        dump(path + ".out", sk.serialize());
      } else if (fam == "kllf") {
        auto sk = kll_sketch<float>::deserialize(buf.data(), buf.size());
        row << ", \"n\": " << sk.get_n()
            << ", \"median\": " << fmt(sk.is_empty() ? 0.0 : sk.get_quantile(0.5))
            << ", \"num_retained\": " << sk.get_num_retained();
        dump(path + ".out", sk.serialize());
      } else if (fam == "klls") {
        auto sk = kll_sketch<std::string>::deserialize(buf.data(), buf.size(),
                                                       serde<std::string>());
        row << ", \"n\": " << sk.get_n() << ", \"median\": \""
            << (sk.is_empty() ? "" : sk.get_quantile(0.5)) << "\""
            << ", \"num_retained\": " << sk.get_num_retained();
        dump(path + ".out", sk.serialize(0, serde<std::string>()));
      } else if (fam == "classic") {
        auto sk = quantiles_sketch<double>::deserialize(buf.data(), buf.size());
        row << ", \"n\": " << sk.get_n()
            << ", \"median\": " << fmt(sk.is_empty() ? 0.0 : sk.get_quantile(0.5))
            << ", \"num_retained\": " << sk.get_num_retained();
        dump(path + ".out", sk.serialize());
      } else if (fam == "reqf") {
        auto sk = req_sketch<float>::deserialize(buf.data(), buf.size());
        row << ", \"n\": " << sk.get_n()
            << ", \"median\": " << fmt(sk.is_empty() ? 0.0 : sk.get_quantile(0.5))
            << ", \"num_retained\": " << sk.get_num_retained();
        dump(path + ".out", sk.serialize());
      } else if (fam == "tdigest") {
        auto sk = tdigest_double::deserialize(buf.data(), buf.size());
        row << ", \"n\": " << sk.get_total_weight()
            << ", \"median\": " << fmt(sk.is_empty() ? 0.0 : sk.get_quantile(0.5));
        dump(path + ".out", sk.serialize());
      } else if (fam == "fis") {
        auto sk = frequent_items_sketch<std::string>::deserialize(buf.data(), buf.size());
        row << ", \"total_weight\": " << sk.get_total_weight()
            << ", \"num_active\": " << sk.get_num_active_items()
            << ", \"max_error\": " << sk.get_maximum_error();
        dump(path + ".out", sk.serialize());
      } else if (fam == "fii") {
        auto sk = frequent_items_sketch<int64_t>::deserialize(buf.data(), buf.size());
        row << ", \"total_weight\": " << sk.get_total_weight()
            << ", \"num_active\": " << sk.get_num_active_items()
            << ", \"max_error\": " << sk.get_maximum_error();
        dump(path + ".out", sk.serialize());
      } else if (fam == "tuple") {
        auto sk = compact_tuple_sketch<double>::deserialize(buf.data(), buf.size());
        double sum = 0;
        for (const auto& e : sk) sum += e.second;
        row << ", \"estimate\": " << fmt(sk.get_estimate())
            << ", \"num_retained\": " << sk.get_num_retained()
            << ", \"summary_sum\": " << fmt(sum);
        dump(path + ".out", sk.serialize());
      } else if (fam == "aod") {
        auto sk = compact_array_of_doubles_sketch::deserialize(buf.data(), buf.size());
        double sum0 = 0;
        for (const auto& e : sk) sum0 += e.second[0];
        row << ", \"estimate\": " << fmt(sk.get_estimate())
            << ", \"num_retained\": " << sk.get_num_retained()
            << ", \"num_values\": " << (int)sk.get_num_values()
            << ", \"sum0\": " << fmt(sum0);
        dump(path + ".out", sk.serialize());
      } else if (fam == "aos") {
        auto sk = compact_array_of_strings_tuple_sketch<>::deserialize(
            buf.data(), buf.size(), DEFAULT_SEED,
            default_array_of_strings_serde<>());
        size_t total_strings = 0;
        for (const auto& e : sk) total_strings += e.second.size();
        row << ", \"estimate\": " << fmt(sk.get_estimate())
            << ", \"num_retained\": " << sk.get_num_retained()
            << ", \"total_strings\": " << total_strings;
        dump(path + ".out",
             sk.serialize(0, default_array_of_strings_serde<>()));
      } else if (fam == "varopti") {
        auto sk = var_opt_sketch<int64_t>::deserialize(buf.data(), buf.size());
        auto ss = sk.estimate_subset_sum([](int64_t) { return true; });
        row << ", \"n\": " << sk.get_n()
            << ", \"num_samples\": " << sk.get_num_samples()
            << ", \"total\": " << fmt(ss.total_sketch_weight);
        dump(path + ".out", sk.serialize());
      } else if (fam == "varopts") {
        auto sk = var_opt_sketch<std::string>::deserialize(buf.data(), buf.size());
        auto ss = sk.estimate_subset_sum([](const std::string&) { return true; });
        row << ", \"n\": " << sk.get_n()
            << ", \"num_samples\": " << sk.get_num_samples()
            << ", \"total\": " << fmt(ss.total_sketch_weight);
        dump(path + ".out", sk.serialize());
      } else if (fam == "countmin") {
        auto sk = count_min_sketch<uint64_t>::deserialize(buf.data(), buf.size(),
                                                          DEFAULT_SEED);
        row << ", \"total_weight\": " << sk.get_total_weight()
            << ", \"num_hashes\": " << (int)sk.get_num_hashes()
            << ", \"num_buckets\": " << sk.get_num_buckets();
        dump(path + ".out", sk.serialize());
      } else if (fam == "cpc") {
        auto sk = cpc_sketch::deserialize(buf.data(), buf.size());
        row << ", \"estimate\": " << fmt(sk.get_estimate())
            << ", \"lgk\": " << (int)sk.get_lg_k()
            << ", \"lb2\": " << fmt(sk.get_lower_bound(2))
            << ", \"ub2\": " << fmt(sk.get_upper_bound(2));
        dump(path + ".out", sk.serialize());
      } else if (fam == "ebpps") {
        auto sk = ebpps_sketch<int64_t>::deserialize(buf.data(), buf.size());
        row << ", \"k\": " << sk.get_k()
            << ", \"n\": " << sk.get_n()
            << ", \"c\": " << fmt(sk.get_c())
            << ", \"cumulative_weight\": " << fmt(sk.get_cumulative_weight());
        dump(path + ".out", sk.serialize());
      } else if (fam == "density") {
        auto sk = density_sketch<float>::deserialize(buf.data(), buf.size());
        row << ", \"k\": " << sk.get_k()
            << ", \"dim\": " << sk.get_dim()
            << ", \"n\": " << sk.get_n()
            << ", \"num_retained\": " << sk.get_num_retained()
            << ", \"est_origin\": "
            << fmt(sk.get_estimate(std::vector<float>(sk.get_dim(), 0.5f)));
        dump(path + ".out", sk.serialize());
      } else if (fam == "bloom") {
        auto sk = bloom_filter::deserialize(buf.data(), buf.size());
        row << ", \"capacity\": " << sk.get_capacity()
            << ", \"num_hashes\": " << (int)sk.get_num_hashes()
            << ", \"bits_used\": " << sk.get_bits_used();
        dump(path + ".out", sk.serialize());
      } else {
        row << ", \"error\": \"unknown family " << fam << "\"";
      }
    } catch (const std::exception& ex) {
      row << ", \"error\": \"" << ex.what() << "\"";
    }
    row << "}";
    std::cout << row.str() << std::endl;
  }
  return 0;
}
