#!/bin/sh
# Build the native measurement-sync runtime (C++17, no external deps).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -std=c++17 -fPIC -shared \
    measurement_sync.cpp -o libmeasurement_sync.so
echo "built native/libmeasurement_sync.so"
