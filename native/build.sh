#!/bin/bash
# Build the native runtime components into native/build/.
set -e
cd "$(dirname "$0")"
cmake -S . -B build -G Ninja -DCMAKE_BUILD_TYPE=Release > /dev/null
cmake --build build
echo "built: $(ls build/*.so)"
