"""Image I/O: native libjpeg/libpng codecs (C++ shim) with PIL fallback."""

from .image import (  # noqa: F401
    ImageReadMode,
    decode_gif,
    decode_image,
    decode_jpeg,
    decode_png,
    decode_webp,
    encode_jpeg,
    encode_png,
    read_file,
    read_image,
    write_file,
    write_jpeg,
    write_png,
)
