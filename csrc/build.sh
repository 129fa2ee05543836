#!/bin/sh
# Build the native graph runtime shared library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 -pthread \
    graph_runtime.cpp -o libngt_graph.so
echo "built $(pwd)/libngt_graph.so"
