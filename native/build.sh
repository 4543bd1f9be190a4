#!/bin/sh
# Build the fgio native extension (zlib is the only dependency).
# Compile to a temp file and rename: replacing the .so atomically leaves
# the old inode mapped in already-running processes (a truncate-in-place
# write would SIGBUS them mid-pipeline).
set -e
cd "$(dirname "$0")"
mkdir -p build
g++ -O3 -march=native -std=c++17 -shared -fPIC -pthread fgio.cpp \
    -o "build/.libfgio.so.tmp.$$" -lz
mv "build/.libfgio.so.tmp.$$" build/libfgio.so
echo "built native/build/libfgio.so"
