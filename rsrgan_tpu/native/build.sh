#!/bin/bash
# Build the native ark codec shared library + the feature-parity oracle.
set -euo pipefail
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -o libark_codec.so ark_codec.cc
g++ -O2 -o kaldi_feat_oracle kaldi_feat_oracle.cc
echo "built $(pwd)/libark_codec.so and $(pwd)/kaldi_feat_oracle"
