#!/bin/sh
# Build the native codec shim. Run from anywhere.
set -e
dir="$(dirname "$0")"
g++ -O2 -shared -fPIC -o "$dir/_codecs.so" "$dir/_codecs.cpp" -ljpeg -lpng -lwebp
echo "built $dir/_codecs.so"
