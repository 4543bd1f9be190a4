#!/bin/sh
# Build the fgio native extension (zlib is the only dependency).
set -e
cd "$(dirname "$0")"
mkdir -p build
g++ -O3 -march=native -std=c++17 -shared -fPIC -pthread fgio.cpp -o build/libfgio.so -lz
echo "built native/build/libfgio.so"
