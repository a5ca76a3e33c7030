#!/bin/sh
# Build the native transport shared library (ctypes-loaded).
cd "$(dirname "$0")"
g++ -O2 -shared -fPIC -std=c++17 -pthread transport.cpp -o libtslam_transport.so
