#!/bin/sh
# Build the host-side augmentation kernels (no pybind11 — plain C ABI for
# ctypes). Invoked lazily by native/__init__.py on first import; safe to run
# by hand. Produces libmdtresample.so next to this script.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -fopenmp -shared resample.cpp wbc.cpp -o libmdtresample.so
