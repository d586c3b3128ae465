#!/bin/sh
# Build the native codec shims. Run from anywhere.
set -e
dir="$(dirname "$0")"
g++ -O2 -shared -fPIC -o "$dir/_codecs.so" "$dir/_codecs.cpp" -ljpeg -lpng -lwebp
echo "built $dir/_codecs.so"
g++ -O2 -shared -fPIC -o "$dir/_video_codecs.so" "$dir/_video_codecs.cpp" \
    -lavformat -lavcodec -lswscale -lswresample -lavutil
echo "built $dir/_video_codecs.so"
libheif="$(ls /usr/lib/*/libheif.so* /usr/lib/libheif.so* 2>/dev/null | head -1)"
if [ -n "$libheif" ]; then
    g++ -O2 -shared -fPIC -o "$dir/_heif.so" "$dir/_heif.cpp" "$libheif"
    echo "built $dir/_heif.so"
else
    echo "libheif not found; skipping _heif.so (HEIC/AVIF decode gated)"
fi
