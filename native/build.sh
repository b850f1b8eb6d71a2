#!/bin/sh
# Build the native mesh kernels shared library next to this script.
set -e
cd "$(dirname "$0")"
g++ -O3 -shared -fPIC -std=c++17 -o libmesh_kernels.so mesh_kernels.cpp
echo "built $(pwd)/libmesh_kernels.so"
