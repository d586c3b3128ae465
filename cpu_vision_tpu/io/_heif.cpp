// HEIC/AVIF codec shim over the system libheif (C ABI, loaded via ctypes).
//
// Counterpart of the reference's csrc/io/image/cpu/decode_heic.cpp and
// decode_avif.cpp (both gated behind build flags there, setup.py:16-33).
// This host ships libheif 1.15 runtime libraries (libde265/x265 for HEVC,
// dav1d/aom for AV1) but no dev headers, so the stable C API is declared
// here directly and the shim links the versioned .so.
//
//   cvt_decode_heif  — decode HEIC or AVIF bytes -> interleaved RGB(A)
//   cvt_encode_heif  — encode HWC uint8 RGB to a .heic/.avif file
//
// Returned buffers are malloc'd; release with cvt_heif_free.

#include <cstdint>
#include <cstdlib>
#include <cstring>

// ---- libheif 1.15 stable C ABI (subset) ----------------------------------
extern "C" {
struct heif_context;
struct heif_image_handle;
struct heif_image;
struct heif_encoder;

struct heif_error {
  int code;      // enum heif_error_code (0 = Ok)
  int subcode;   // enum heif_suberror_code
  const char* message;
};

// enum values from libheif's heif.h (stable ABI)
enum { heif_colorspace_RGB = 1 };
enum { heif_chroma_interleaved_RGB = 10, heif_chroma_interleaved_RGBA = 11 };
enum { heif_channel_interleaved = 10 };
enum { heif_compression_HEVC = 1, heif_compression_AV1 = 4 };

heif_context* heif_context_alloc(void);
void heif_context_free(heif_context*);
heif_error heif_context_read_from_memory_without_copy(heif_context*,
                                                      const void* mem,
                                                      size_t size,
                                                      const void* options);
heif_error heif_context_get_primary_image_handle(heif_context*,
                                                 heif_image_handle**);
int heif_image_handle_get_width(const heif_image_handle*);
int heif_image_handle_get_height(const heif_image_handle*);
int heif_image_handle_has_alpha_channel(const heif_image_handle*);
heif_error heif_decode_image(const heif_image_handle*, heif_image**,
                             int colorspace, int chroma, const void* options);
const uint8_t* heif_image_get_plane_readonly(const heif_image*, int channel,
                                             int* out_stride);
void heif_image_release(const heif_image*);
void heif_image_handle_release(const heif_image_handle*);

heif_error heif_context_get_encoder_for_format(heif_context*, int format,
                                               heif_encoder**);
void heif_encoder_release(heif_encoder*);
heif_error heif_encoder_set_lossy_quality(heif_encoder*, int quality);
heif_error heif_encoder_set_lossless(heif_encoder*, int enable);
heif_error heif_image_create(int width, int height, int colorspace,
                             int chroma, heif_image**);
heif_error heif_image_add_plane(heif_image*, int channel, int width,
                                int height, int bit_depth);
uint8_t* heif_image_get_plane(heif_image*, int channel, int* out_stride);
heif_error heif_context_encode_image(heif_context*, const heif_image*,
                                     heif_encoder*, const void* options,
                                     heif_image_handle**);
heif_error heif_context_write_to_file(heif_context*, const char* filename);
}

// ---- C ABI exported to ctypes --------------------------------------------
extern "C" {

void cvt_heif_free(void* p) { free(p); }

// Decode HEIC or AVIF bytes (libheif sniffs the brand) to packed RGB(A).
// rc: 0 ok, negative on failure.
int cvt_decode_heif(const uint8_t* data, size_t size, uint8_t** out, int* h,
                    int* w, int* c) {
  heif_context* ctx = heif_context_alloc();
  if (!ctx) return -1;
  heif_image_handle* handle = nullptr;
  heif_image* img = nullptr;
  int rc = 0;
  do {
    if (heif_context_read_from_memory_without_copy(ctx, data, size, nullptr)
            .code != 0) { rc = -2; break; }
    if (heif_context_get_primary_image_handle(ctx, &handle).code != 0) {
      rc = -3; break;
    }
    const int alpha = heif_image_handle_has_alpha_channel(handle);
    const int chroma = alpha ? heif_chroma_interleaved_RGBA
                             : heif_chroma_interleaved_RGB;
    if (heif_decode_image(handle, &img, heif_colorspace_RGB, chroma, nullptr)
            .code != 0) { rc = -4; break; }
    const int W = heif_image_handle_get_width(handle);
    const int H = heif_image_handle_get_height(handle);
    const int C = alpha ? 4 : 3;
    int stride = 0;
    const uint8_t* plane =
        heif_image_get_plane_readonly(img, heif_channel_interleaved, &stride);
    if (!plane) { rc = -5; break; }
    *out = (uint8_t*)malloc((size_t)H * W * C);
    if (!*out) { rc = -6; break; }
    for (int y = 0; y < H; ++y)
      memcpy(*out + (size_t)y * W * C, plane + (size_t)y * stride,
             (size_t)W * C);
    *h = H; *w = W; *c = C;
  } while (false);
  if (img) heif_image_release(img);
  if (handle) heif_image_handle_release(handle);
  heif_context_free(ctx);
  return rc;
}

// Encode packed RGB (HWC uint8, c==3) to `path`.
// format: 0 = HEVC (.heic), 1 = AV1 (.avif).  quality 0-100.
int cvt_encode_heif(const char* path, const uint8_t* rgb, int h, int w,
                    int format, int quality) {
  heif_context* ctx = heif_context_alloc();
  if (!ctx) return -1;
  heif_encoder* enc = nullptr;
  heif_image* img = nullptr;
  int rc = 0;
  do {
    const int comp = format == 1 ? heif_compression_AV1 : heif_compression_HEVC;
    if (heif_context_get_encoder_for_format(ctx, comp, &enc).code != 0) {
      rc = -2; break;
    }
    heif_encoder_set_lossy_quality(enc, quality);
    if (heif_image_create(w, h, heif_colorspace_RGB,
                          heif_chroma_interleaved_RGB, &img).code != 0) {
      rc = -3; break;
    }
    if (heif_image_add_plane(img, heif_channel_interleaved, w, h, 8).code
        != 0) { rc = -4; break; }
    int stride = 0;
    uint8_t* plane = heif_image_get_plane(img, heif_channel_interleaved,
                                          &stride);
    if (!plane) { rc = -5; break; }
    for (int y = 0; y < h; ++y)
      memcpy(plane + (size_t)y * stride, rgb + (size_t)y * w * 3,
             (size_t)w * 3);
    if (heif_context_encode_image(ctx, img, enc, nullptr, nullptr).code != 0) {
      rc = -6; break;
    }
    if (heif_context_write_to_file(ctx, path).code != 0) { rc = -7; break; }
  } while (false);
  if (img) heif_image_release(img);
  if (enc) heif_encoder_release(enc);
  heif_context_free(ctx);
  return rc;
}

}  // extern "C"
