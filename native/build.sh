#!/usr/bin/env bash
# Build the native components into native/lib/.
set -eu
cd "$(dirname "$0")"
mkdir -p lib
g++ -O3 -march=native -std=c++17 -shared -fPIC -pthread \
  loader/valle_loader.cc -o lib/libvalle_data.so
echo "built native/lib/libvalle_data.so"
