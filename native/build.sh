#!/bin/sh
# Build the native IO library next to this script (no cmake required):
#   ./native/build.sh
# or with cmake:  cmake -S native -B native/build && cmake --build native/build
set -e
cd "$(dirname "$0")"
g++ -O3 -std=c++17 -shared -fPIC -fvisibility=hidden -pthread \
    vksift_io.cpp -o libvksift_io.so
echo "built $(pwd)/libvksift_io.so"
