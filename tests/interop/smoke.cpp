#include <iostream>
#include <fstream>
#include "theta_sketch.hpp"
#include "cpc_sketch.hpp"
#include "hll.hpp"
int main() {
  auto t = datasketches::update_theta_sketch::builder().build();
  for (int i = 0; i < 1000; i++) t.update(i);
  auto c = t.compact();
  auto bytes = c.serialize();
  std::cout << "theta est=" << c.get_estimate() << " bytes=" << bytes.size() << std::endl;
  datasketches::cpc_sketch cpc(11);
  for (int i = 0; i < 1000; i++) cpc.update(i);
  auto cb = cpc.serialize();
  std::cout << "cpc est=" << cpc.get_estimate() << " bytes=" << cb.size() << std::endl;
  return 0;
}
