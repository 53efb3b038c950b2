#!/bin/sh
# Build the reference-interop test harness against the READ-ONLY
# apache/datasketches-cpp headers.  Test-tooling only; the engine itself has
# no C++ dependency.
set -e
cd "$(dirname "$0")"
R="${REFERENCE_ROOT:-/root/reference}"
INC="-I$R/common/include -I$R/theta/include -I$R/hll/include -I$R/kll/include \
 -I$R/quantiles/include -I$R/req/include -I$R/tdigest/include -I$R/fi/include \
 -I$R/tuple/include -I$R/sampling/include -I$R/count/include \
 -I$R/filters/include -I$R/cpc/include -I$R/density/include"
g++ -O2 -std=c++17 $INC gen_fixtures.cpp -o gen_fixtures
if [ -f read_blobs.cpp ]; then
  g++ -O2 -std=c++17 $INC read_blobs.cpp -o read_blobs
fi
echo built
