#!/bin/bash
# Build the native ark codec shared library.
set -euo pipefail
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -o libark_codec.so ark_codec.cc
echo "built $(pwd)/libark_codec.so"
