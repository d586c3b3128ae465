// Native image codecs: JPEG/PNG decode + encode over libjpeg/libpng.
//
// Counterpart of the reference's C++ image extension
// (torchvision csrc/io/image/cpu/{decode_jpeg,decode_png,encode_jpeg,
// encode_png}.cpp and the magic-byte sniffing of decode_image.cpp:31-83),
// re-designed as a plain C ABI for ctypes: decode on the host, hand HWC
// uint8 buffers straight to device transfer — no framework tensor types in
// the boundary.
//
// Build: see cpu_vision_tpu/io/build.sh (g++ -shared -ljpeg -lpng).

#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <webp/decode.h>

extern "C" {

// ---------------------------------------------------------------- common

void cvt_free(uint8_t* p) { std::free(p); }

// error codes
enum {
  CVT_OK = 0,
  CVT_ERR_FORMAT = 1,
  CVT_ERR_DECODE = 2,
  CVT_ERR_ALLOC = 3,
  CVT_ERR_ARGS = 4,
};

// 0 = unknown, 1 = jpeg, 2 = png, 3 = webp, 4 = gif, 5 = bmp
int cvt_sniff(const uint8_t* data, size_t len) {
  if (len >= 3 && data[0] == 0xFF && data[1] == 0xD8 && data[2] == 0xFF) return 1;
  if (len >= 8 && !std::memcmp(data, "\x89PNG\r\n\x1a\n", 8)) return 2;
  if (len >= 12 && !std::memcmp(data, "RIFF", 4) && !std::memcmp(data + 8, "WEBP", 4)) return 3;
  if (len >= 6 && (!std::memcmp(data, "GIF87a", 6) || !std::memcmp(data, "GIF89a", 6))) return 4;
  if (len >= 2 && data[0] == 'B' && data[1] == 'M') return 5;
  return 0;
}

// ---------------------------------------------------------------- jpeg

struct CvtJpegErr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

static void cvt_jpeg_error_exit(j_common_ptr cinfo) {
  CvtJpegErr* err = reinterpret_cast<CvtJpegErr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode JPEG bytes to HWC uint8 (grayscale stays 1 channel, else RGB).
int cvt_decode_jpeg(const uint8_t* data, size_t len, uint8_t** out, int* h,
                    int* w, int* c) {
  if (!data || !out || !h || !w || !c) return CVT_ERR_ARGS;
  jpeg_decompress_struct cinfo;
  CvtJpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = cvt_jpeg_error_exit;
  uint8_t* buffer = nullptr;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    std::free(buffer);
    return CVT_ERR_DECODE;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return CVT_ERR_FORMAT;
  }
  cinfo.out_color_space = cinfo.num_components == 1 ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_start_decompress(&cinfo);
  const int H = cinfo.output_height;
  const int W = cinfo.output_width;
  const int C = cinfo.output_components;
  const size_t stride = static_cast<size_t>(W) * C;
  buffer = static_cast<uint8_t*>(std::malloc(static_cast<size_t>(H) * stride));
  if (!buffer) {
    jpeg_destroy_decompress(&cinfo);
    return CVT_ERR_ALLOC;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = buffer + cinfo.output_scanline * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  *out = buffer;
  *h = H;
  *w = W;
  *c = C;
  return CVT_OK;
}

// Encode HWC uint8 (1 or 3 channels) to JPEG.
int cvt_encode_jpeg(const uint8_t* img, int h, int w, int c, int quality,
                    uint8_t** out, size_t* out_len) {
  if (!img || !out || !out_len || (c != 1 && c != 3)) return CVT_ERR_ARGS;
  jpeg_compress_struct cinfo;
  CvtJpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = cvt_jpeg_error_exit;
  uint8_t* mem = nullptr;
  unsigned long mem_size = 0;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_compress(&cinfo);
    std::free(mem);
    return CVT_ERR_DECODE;
  }
  jpeg_create_compress(&cinfo);
  jpeg_mem_dest(&cinfo, &mem, &mem_size);
  cinfo.image_width = w;
  cinfo.image_height = h;
  cinfo.input_components = c;
  cinfo.in_color_space = c == 1 ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_set_defaults(&cinfo);
  jpeg_set_quality(&cinfo, quality, TRUE);
  jpeg_start_compress(&cinfo, TRUE);
  const size_t stride = static_cast<size_t>(w) * c;
  while (cinfo.next_scanline < cinfo.image_height) {
    JSAMPROW row = const_cast<uint8_t*>(img) + cinfo.next_scanline * stride;
    jpeg_write_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_compress(&cinfo);
  jpeg_destroy_compress(&cinfo);
  // mem is allocated by libjpeg with malloc; hand it to the caller
  *out = mem;
  *out_len = mem_size;
  return CVT_OK;
}

// ---------------------------------------------------------------- png

struct CvtPngReader {
  const uint8_t* data;
  size_t len;
  size_t pos;
};

static void cvt_png_read(png_structp png, png_bytep dst, png_size_t n) {
  CvtPngReader* r = static_cast<CvtPngReader*>(png_get_io_ptr(png));
  if (r->pos + n > r->len) {
    png_error(png, "read past end");
    return;
  }
  std::memcpy(dst, r->data + r->pos, n);
  r->pos += n;
}

// Decode PNG bytes to HWC uint8 (8-bit; 16-bit inputs are scaled down;
// palette/gray expanded; alpha preserved).
int cvt_decode_png(const uint8_t* data, size_t len, uint8_t** out, int* h,
                   int* w, int* c) {
  if (!data || !out || !h || !w || !c) return CVT_ERR_ARGS;
  if (png_sig_cmp(data, 0, len < 8 ? len : 8)) return CVT_ERR_FORMAT;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return CVT_ERR_ALLOC;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return CVT_ERR_ALLOC;
  }
  uint8_t* buffer = nullptr;
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::free(buffer);
    return CVT_ERR_DECODE;
  }
  CvtPngReader reader{data, len, 0};
  png_set_read_fn(png, &reader, cvt_png_read);
  png_read_info(png, info);

  png_uint_32 W, H;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &W, &H, &bit_depth, &color_type, nullptr, nullptr, nullptr);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (bit_depth == 16) png_set_scale_16(png);
  png_read_update_info(png, info);

  const int C = png_get_channels(png, info);
  const size_t stride = png_get_rowbytes(png, info);
  buffer = static_cast<uint8_t*>(std::malloc(static_cast<size_t>(H) * stride));
  if (!buffer) {
    png_destroy_read_struct(&png, &info, nullptr);
    return CVT_ERR_ALLOC;
  }
  std::vector<png_bytep> rows(H);
  for (png_uint_32 y = 0; y < H; ++y) rows[y] = buffer + y * stride;
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  *out = buffer;
  *h = static_cast<int>(H);
  *w = static_cast<int>(W);
  *c = C;
  return CVT_OK;
}

// Decode PNG preserving bit depth: *depth returns 8 or 16 and the buffer
// holds native-endian uint8/uint16 HWC (reference decodes 8/16-bit in C,
// csrc/io/image/cpu/decode_png.cpp — the stereo/flow ground-truth path).
int cvt_decode_png16(const uint8_t* data, size_t len, uint8_t** out, int* h,
                     int* w, int* c, int* depth) {
  if (!data || !out || !h || !w || !c || !depth) return CVT_ERR_ARGS;
  if (png_sig_cmp(data, 0, len < 8 ? len : 8)) return CVT_ERR_FORMAT;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return CVT_ERR_ALLOC;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return CVT_ERR_ALLOC;
  }
  uint8_t* buffer = nullptr;
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::free(buffer);
    return CVT_ERR_DECODE;
  }
  CvtPngReader reader{data, len, 0};
  png_set_read_fn(png, &reader, cvt_png_read);
  png_read_info(png, info);

  png_uint_32 W, H;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &W, &H, &bit_depth, &color_type, nullptr, nullptr, nullptr);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
#if defined(PNG_READ_SWAP_SUPPORTED)
  if (bit_depth == 16) png_set_swap(png);  // PNG is big-endian on disk
#endif
  png_read_update_info(png, info);

  const int C = png_get_channels(png, info);
  const size_t stride = png_get_rowbytes(png, info);
  buffer = static_cast<uint8_t*>(std::malloc(static_cast<size_t>(H) * stride));
  if (!buffer) {
    png_destroy_read_struct(&png, &info, nullptr);
    return CVT_ERR_ALLOC;
  }
  std::vector<png_bytep> rows(H);
  for (png_uint_32 y = 0; y < H; ++y) rows[y] = buffer + y * stride;
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  const int out_depth = png_get_bit_depth(png, info);
  png_destroy_read_struct(&png, &info, nullptr);
  *out = buffer;
  *h = static_cast<int>(H);
  *w = static_cast<int>(W);
  *c = C;
  *depth = out_depth >= 16 ? 16 : 8;
  return CVT_OK;
}

struct CvtPngWriter {
  std::vector<uint8_t>* out;
};

static void cvt_png_write(png_structp png, png_bytep src, png_size_t n) {
  CvtPngWriter* wtr = static_cast<CvtPngWriter*>(png_get_io_ptr(png));
  wtr->out->insert(wtr->out->end(), src, src + n);
}

static void cvt_png_flush(png_structp) {}

// Encode HWC uint8 (1/2/3/4 channels) to PNG.
int cvt_encode_png(const uint8_t* img, int h, int w, int c, int compression,
                   uint8_t** out, size_t* out_len) {
  if (!img || !out || !out_len || c < 1 || c > 4) return CVT_ERR_ARGS;
  png_structp png = png_create_write_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return CVT_ERR_ALLOC;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_write_struct(&png, nullptr);
    return CVT_ERR_ALLOC;
  }
  std::vector<uint8_t> bytes;
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_write_struct(&png, &info);
    return CVT_ERR_DECODE;
  }
  CvtPngWriter wtr{&bytes};
  png_set_write_fn(png, &wtr, cvt_png_write, cvt_png_flush);
  const int color = c == 1   ? PNG_COLOR_TYPE_GRAY
                    : c == 2 ? PNG_COLOR_TYPE_GRAY_ALPHA
                    : c == 3 ? PNG_COLOR_TYPE_RGB
                             : PNG_COLOR_TYPE_RGBA;
  png_set_IHDR(png, info, w, h, 8, color, PNG_INTERLACE_NONE,
               PNG_COMPRESSION_TYPE_DEFAULT, PNG_FILTER_TYPE_DEFAULT);
  png_set_compression_level(png, compression);
  png_write_info(png, info);
  const size_t stride = static_cast<size_t>(w) * c;
  for (int y = 0; y < h; ++y) {
    png_write_row(png, const_cast<uint8_t*>(img) + y * stride);
  }
  png_write_end(png, info);
  png_destroy_write_struct(&png, &info);
  uint8_t* mem = static_cast<uint8_t*>(std::malloc(bytes.size()));
  if (!mem) return CVT_ERR_ALLOC;
  std::memcpy(mem, bytes.data(), bytes.size());
  *out = mem;
  *out_len = bytes.size();
  return CVT_OK;
}

// ---------------------------------------------------------------- webp

// Decode WebP bytes to HWC uint8 (RGB, or RGBA when the file has alpha).
int cvt_decode_webp(const uint8_t* data, size_t len, uint8_t** out, int* h,
                    int* w, int* c) {
  if (!data || !out || !h || !w || !c) return CVT_ERR_ARGS;
  WebPBitstreamFeatures feat;
  if (WebPGetFeatures(data, len, &feat) != VP8_STATUS_OK) return CVT_ERR_FORMAT;
  const int C = feat.has_alpha ? 4 : 3;
  const size_t stride = static_cast<size_t>(feat.width) * C;
  uint8_t* buffer = static_cast<uint8_t*>(std::malloc(feat.height * stride));
  if (!buffer) return CVT_ERR_ALLOC;
  uint8_t* ok = feat.has_alpha
                    ? WebPDecodeRGBAInto(data, len, buffer, feat.height * stride, stride)
                    : WebPDecodeRGBInto(data, len, buffer, feat.height * stride, stride);
  if (!ok) {
    std::free(buffer);
    return CVT_ERR_DECODE;
  }
  *out = buffer;
  *h = feat.height;
  *w = feat.width;
  *c = C;
  return CVT_OK;
}

// ---------------------------------------------------------------- gif

// Self-contained GIF decoder (counterpart of the reference's vendored giflib
// + csrc/io/image/cpu/decode_gif.cpp): LZW, interlacing, local/global color
// tables, GIF89a transparency (composited onto the background color).
// Decodes the FIRST frame onto the full logical canvas as HWC RGB.

namespace {

struct GifReader {
  const uint8_t* p;
  size_t n;
  size_t pos = 0;
  bool ok = true;

  uint8_t u8() {
    if (pos >= n) { ok = false; return 0; }
    return p[pos++];
  }
  uint16_t u16() {  // little-endian
    uint16_t lo = u8(), hi = u8();
    return static_cast<uint16_t>(lo | (hi << 8));
  }
  bool skip(size_t k) {
    if (pos + k > n) { ok = false; return false; }
    pos += k;
    return true;
  }
};

// LZW decompression of the image sub-blocks into `indices` (one palette
// index per pixel, row-major in stream order).
bool gif_lzw(GifReader& r, int min_code_size, std::vector<uint8_t>& indices,
             size_t max_pixels) {
  if (min_code_size < 2 || min_code_size > 11) return false;
  const int clear_code = 1 << min_code_size;
  const int eoi_code = clear_code + 1;
  // dictionary: prefix chain + suffix byte
  static thread_local std::vector<uint16_t> prefix;
  static thread_local std::vector<uint8_t> suffix;
  prefix.assign(4096, 0);
  suffix.assign(4096, 0);
  int next_code = eoi_code + 1;
  int code_size = min_code_size + 1;
  int prev = -1;

  uint32_t bits = 0;
  int nbits = 0;
  uint8_t block_remaining = 0;
  std::vector<uint8_t> first_stack;
  first_stack.reserve(4096);

  for (;;) {
    while (nbits < code_size) {
      if (block_remaining == 0) {
        block_remaining = r.u8();
        if (!r.ok) return false;
        if (block_remaining == 0) return true;  // block terminator = done
      }
      bits |= static_cast<uint32_t>(r.u8()) << nbits;
      if (!r.ok) return false;
      nbits += 8;
      --block_remaining;
    }
    int code = bits & ((1 << code_size) - 1);
    bits >>= code_size;
    nbits -= code_size;

    if (code == clear_code) {
      next_code = eoi_code + 1;
      code_size = min_code_size + 1;
      prev = -1;
      continue;
    }
    if (code == eoi_code) {
      // consume remaining sub-blocks up to the terminator
      while (block_remaining > 0) { r.u8(); --block_remaining; }
      for (;;) {
        uint8_t s = r.u8();
        if (!r.ok || s == 0) break;
        if (!r.skip(s)) return false;
      }
      return true;
    }
    if (code >= next_code && !(code == next_code && prev >= 0)) return false;

    // expand `code` (or prev+first(prev) for the not-yet-defined case)
    first_stack.clear();
    int cur = (code == next_code) ? prev : code;
    while (cur >= clear_code + 2) {
      first_stack.push_back(suffix[cur]);
      cur = prefix[cur];
    }
    uint8_t first = static_cast<uint8_t>(cur);
    indices.push_back(first);
    for (auto it = first_stack.rbegin(); it != first_stack.rend(); ++it)
      indices.push_back(*it);
    if (code == next_code) indices.push_back(first);
    if (indices.size() > max_pixels) return false;

    if (prev >= 0 && next_code < 4096) {
      prefix[next_code] = static_cast<uint16_t>(prev);
      suffix[next_code] = first;
      ++next_code;
      if (next_code == (1 << code_size) && code_size < 12) ++code_size;
    }
    prev = code;
  }
}

// One parsed frame: palette-index raster (deinterlaced) + its GCE state.
struct GifFrame {
  int left, top, fw, fh;
  int transparent;          // palette index, -1 if none
  int disposal;             // GCE disposal method (0..7); 1 = DO_NOT
  int pal_size;
  uint8_t palette[256][3];
  std::vector<uint8_t> indices;  // fw*fh, row-major (interlacing undone)
};

// Parse up to `max_frames` frames (<=0 means all).  Returns CVT_OK and fills
// `frames`, canvas dims and background color.
int gif_parse(const uint8_t* data, size_t len, int max_frames,
              std::vector<GifFrame>& frames, int* canvas_w, int* canvas_h,
              uint8_t bg[3]) {
  if (cvt_sniff(data, len) != 4) return CVT_ERR_FORMAT;
  GifReader r{data, len};
  r.skip(6);  // header
  const int W = r.u16(), H = r.u16();
  const uint8_t packed = r.u8();
  const uint8_t bg_index = r.u8();
  r.u8();  // aspect
  if (!r.ok || W <= 0 || H <= 0) return CVT_ERR_DECODE;
  if (static_cast<size_t>(W) * H > (1u << 30)) return CVT_ERR_DECODE;

  uint8_t gct[256][3] = {};
  int gct_size = 0;
  if (packed & 0x80) {
    gct_size = 2 << (packed & 0x07);
    for (int i = 0; i < gct_size; ++i)
      for (int k = 0; k < 3; ++k) gct[i][k] = r.u8();
  }
  bg[0] = bg[1] = bg[2] = 0;
  if (gct_size > 0 && bg_index < gct_size) {
    bg[0] = gct[bg_index][0]; bg[1] = gct[bg_index][1]; bg[2] = gct[bg_index][2];
  }
  *canvas_w = W;
  *canvas_h = H;

  // GCE state applies to the NEXT image only, then resets (GIF89a spec).
  int transparent = -1;
  int disposal = 0;
  for (;;) {
    if (!r.ok) return frames.empty() ? CVT_ERR_DECODE : CVT_OK;
    uint8_t tag = r.u8();
    if (!r.ok || tag == 0x3B)  // trailer (or truncated after last frame)
      return frames.empty() ? CVT_ERR_DECODE : CVT_OK;
    if (tag == 0x21) {  // extension
      uint8_t label = r.u8();
      if (label == 0xF9) {  // graphic control
        uint8_t sz = r.u8();
        uint8_t flags = r.u8();
        r.u16();  // delay
        uint8_t tindex = r.u8();
        transparent = (flags & 0x01) ? tindex : -1;
        disposal = (flags >> 2) & 0x07;
        if (sz > 4) r.skip(sz - 4);
        if (r.u8() != 0) return CVT_ERR_DECODE;  // terminator
      } else {
        for (;;) {
          uint8_t s = r.u8();
          if (!r.ok) return CVT_ERR_DECODE;
          if (s == 0) break;
          if (!r.skip(s)) return CVT_ERR_DECODE;
        }
      }
      continue;
    }
    if (tag != 0x2C) return CVT_ERR_DECODE;

    // ---- image descriptor ----
    GifFrame f;
    f.left = r.u16(); f.top = r.u16();
    f.fw = r.u16(); f.fh = r.u16();
    const uint8_t ipacked = r.u8();
    if (!r.ok || f.fw <= 0 || f.fh <= 0) return CVT_ERR_DECODE;
    if (static_cast<size_t>(f.fw) * f.fh > (1u << 30)) return CVT_ERR_DECODE;

    f.pal_size = gct_size;
    std::memcpy(f.palette, gct, sizeof(gct));
    if (ipacked & 0x80) {
      f.pal_size = 2 << (ipacked & 0x07);
      for (int i = 0; i < f.pal_size; ++i)
        for (int k = 0; k < 3; ++k) f.palette[i][k] = r.u8();
    }
    if (f.pal_size == 0) return CVT_ERR_DECODE;
    f.transparent = transparent;
    f.disposal = disposal;
    transparent = -1;  // GCE consumed
    disposal = 0;

    const int min_code_size = r.u8();
    std::vector<uint8_t> raw;
    raw.reserve(static_cast<size_t>(f.fw) * f.fh);
    if (!gif_lzw(r, min_code_size, raw, static_cast<size_t>(f.fw) * f.fh + 4096))
      return CVT_ERR_DECODE;
    if (raw.size() < static_cast<size_t>(f.fw) * f.fh) return CVT_ERR_DECODE;

    // undo interlacing so indices are plain row-major
    if (ipacked & 0x40) {
      const int starts[4] = {0, 4, 2, 1};
      const int steps[4] = {8, 8, 4, 2};
      f.indices.resize(static_cast<size_t>(f.fw) * f.fh);
      size_t src_row = 0;
      for (int pass = 0; pass < 4; ++pass)
        for (int fy = starts[pass]; fy < f.fh; fy += steps[pass], ++src_row)
          std::memcpy(f.indices.data() + static_cast<size_t>(fy) * f.fw,
                      raw.data() + src_row * f.fw, f.fw);
    } else {
      raw.resize(static_cast<size_t>(f.fw) * f.fh);
      f.indices = std::move(raw);
    }
    frames.push_back(std::move(f));
    if (max_frames > 0 && static_cast<int>(frames.size()) >= max_frames)
      return CVT_OK;
  }
}

// Composite parsed frames onto canvases, reference-compatible
// (csrc/io/image/cpu/decode_gif.cpp:104-160): frame i starts from frame i-1
// iff its OWN disposal method is DISPOSE_DO_NOT (1), else from the
// background color; transparent pixels keep the underlying canvas.
int gif_composite(const std::vector<GifFrame>& frames, int W, int H,
                  const uint8_t bg[3], uint8_t** out, int* n_out, int* h,
                  int* w, int* c) {
  // reference: canvas = max(logical screen, FIRST frame) in each dim
  const int out_w = std::max(W, frames[0].fw);
  const int out_h = std::max(H, frames[0].fh);
  const size_t npix = static_cast<size_t>(out_w) * out_h;
  const size_t nframes = frames.size();
  uint8_t* buf = static_cast<uint8_t*>(std::malloc(nframes * npix * 3));
  if (!buf) return CVT_ERR_ALLOC;

  for (size_t i = 0; i < nframes; ++i) {
    uint8_t* img = buf + i * npix * 3;
    const GifFrame& f = frames[i];
    if (i > 0 && f.disposal == 1) {  // DISPOSE_DO_NOT: draw on previous
      std::memcpy(img, buf + (i - 1) * npix * 3, npix * 3);
    } else {
      for (size_t p = 0; p < npix; ++p) {
        img[3 * p] = bg[0]; img[3 * p + 1] = bg[1]; img[3 * p + 2] = bg[2];
      }
    }
    // blit, clipped to the canvas
    const int y0 = std::max(0, -f.top), y1 = std::min(f.fh, out_h - f.top);
    const int x0 = std::max(0, -f.left), x1 = std::min(f.fw, out_w - f.left);
    for (int fy = y0; fy < y1; ++fy) {
      const uint8_t* src = f.indices.data() + static_cast<size_t>(fy) * f.fw;
      uint8_t* dst =
          img + (static_cast<size_t>(f.top + fy) * out_w + f.left + x0) * 3;
      for (int x = x0; x < x1; ++x) {
        int idx = src[x];
        if (idx == f.transparent) { dst += 3; continue; }
        if (idx >= f.pal_size) idx = 0;
        *dst++ = f.palette[idx][0];
        *dst++ = f.palette[idx][1];
        *dst++ = f.palette[idx][2];
      }
    }
  }
  *out = buf;
  *n_out = static_cast<int>(nframes);
  *h = out_h;
  *w = out_w;
  *c = 3;
  return CVT_OK;
}

}  // namespace

// All frames of a (possibly animated) GIF as one (N, H, W, 3) buffer
// (counterpart of the reference's decode_gif over vendored giflib,
// csrc/io/image/cpu/decode_gif.cpp:55-160, which returns N frames with
// DISPOSE_DO_NOT / background compositing and GIF89a transparency).
int cvt_decode_gif_frames(const uint8_t* data, size_t len, uint8_t** out,
                          int* n, int* h, int* w, int* c) {
  if (!data || !out || !n || !h || !w || !c) return CVT_ERR_ARGS;
  std::vector<GifFrame> frames;
  int W = 0, H = 0;
  uint8_t bg[3];
  int rc = gif_parse(data, len, /*max_frames=*/0, frames, &W, &H, bg);
  if (rc != CVT_OK) return rc;
  if (frames.empty()) return CVT_ERR_DECODE;
  return gif_composite(frames, W, H, bg, out, n, h, w, c);
}

// First frame only (HWC), kept for cvt_decode_image and speed: parsing
// stops after the first image descriptor.
int cvt_decode_gif(const uint8_t* data, size_t len, uint8_t** out, int* h,
                   int* w, int* c) {
  if (!data || !out || !h || !w || !c) return CVT_ERR_ARGS;
  std::vector<GifFrame> frames;
  int W = 0, H = 0;
  uint8_t bg[3];
  int rc = gif_parse(data, len, /*max_frames=*/1, frames, &W, &H, bg);
  if (rc != CVT_OK) return rc;
  if (frames.empty()) return CVT_ERR_DECODE;
  int n = 0;
  return gif_composite(frames, W, H, bg, out, &n, h, w, c);
}

// Decode any supported format by sniffing (reference decode_image.cpp:31-83).
int cvt_decode_image(const uint8_t* data, size_t len, uint8_t** out, int* h,
                     int* w, int* c) {
  switch (cvt_sniff(data, len)) {
    case 1:
      return cvt_decode_jpeg(data, len, out, h, w, c);
    case 2:
      return cvt_decode_png(data, len, out, h, w, c);
    case 3:
      return cvt_decode_webp(data, len, out, h, w, c);
    case 4:
      return cvt_decode_gif(data, len, out, h, w, c);
    default:
      return CVT_ERR_FORMAT;
  }
}

}  // extern "C"
