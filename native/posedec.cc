// posedec — native (C++) image-decode tier of the pose3d_tpu host input
// pipeline.
//
// The reference's hot host path decodes JPEG/PNG per sample in Python
// worker threads via torchvision (reference chunked_dataset.py:100-129,
// 12-thread pool at :247-264), which serializes on the GIL around every
// decode call. This library performs decode → bilinear resize → float
// normalize for a whole batch of encoded blobs in ONE C call with an
// internal std::thread pool — no GIL, no per-image Python dispatch.
//
// C ABI (ctypes-friendly):
//   pd_decode_jpeg_batch(blobs, sizes, n, out_h, out_w, out, threads, ok)
//     RGB  f32 [0,1]
//   pd_decode_png_gray_batch(blobs, sizes, n, out_h, out_w, out, threads, ok)
//     GRAY f32 [0,1]
//   pd_decode_jpeg_batch_u8 / pd_decode_png_gray_batch_u8
//     same, but write uint8 0..255 (resize interpolation rounded to
//     nearest) — the memory-lean pipeline mode: 1/4 the prefetch-queue
//     footprint, and the /255 normalize moves on-device
//     (train.step.decompact_batch).
// All write [n, out_h, out_w, C] row-major into caller-allocated `out`
// and return the number of successfully decoded images. `ok` (may be
// NULL) receives a per-slot 1/0 success flag — the honest failure signal
// (failures also leave zeros at their slot, but all-zero is a legal
// image, so callers should use the flags).
//
// Build: make -C native  (links against system libjpeg + libpng)

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>
#include <png.h>

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <csetjmp>
#include <thread>
#include <vector>

namespace {

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto *err = reinterpret_cast<JpegErrorMgr *>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Output conversion of one interpolated value (0..255 float domain).
inline void store_px(float v, float *out) { *out = v * (1.0f / 255.0f); }
inline void store_px(float v, uint8_t *out) {
  *out = static_cast<uint8_t>(std::clamp(v + 0.5f, 0.0f, 255.0f));
}

// Bilinear resize HWC uint8 -> float32 [0,1] or uint8 0..255 (rounded).
template <typename OutT>
void resize_bilinear_u8(const uint8_t *src, int sh, int sw, int c,
                        OutT *dst, int dh, int dw) {
  const float sy = static_cast<float>(sh) / dh;
  const float sx = static_cast<float>(sw) / dw;
  for (int y = 0; y < dh; ++y) {
    // align_corners=false convention (matches cv2.INTER_LINEAR)
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = static_cast<int>(fy >= 0 ? fy : fy - 1);
    float wy = fy - y0;
    int y0c = std::clamp(y0, 0, sh - 1);
    int y1c = std::clamp(y0 + 1, 0, sh - 1);
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = static_cast<int>(fx >= 0 ? fx : fx - 1);
      float wx = fx - x0;
      int x0c = std::clamp(x0, 0, sw - 1);
      int x1c = std::clamp(x0 + 1, 0, sw - 1);
      const uint8_t *p00 = src + (y0c * sw + x0c) * c;
      const uint8_t *p01 = src + (y0c * sw + x1c) * c;
      const uint8_t *p10 = src + (y1c * sw + x0c) * c;
      const uint8_t *p11 = src + (y1c * sw + x1c) * c;
      OutT *out = dst + (y * dw + x) * c;
      for (int ch = 0; ch < c; ++ch) {
        float top = p00[ch] * (1 - wx) + p01[ch] * wx;
        float bot = p10[ch] * (1 - wx) + p11[ch] * wx;
        store_px(top * (1 - wy) + bot * wy, out + ch);
      }
    }
  }
}

template <typename OutT>
bool decode_jpeg_one(const uint8_t *blob, size_t size, int out_h, int out_w,
                     OutT *out) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t *>(blob),
               static_cast<unsigned long>(size));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  // DCT-domain scaled decode: pick the smallest 1/2^k scale that still
  // covers the target size — decoding at 1/2 costs ~1/4 of full decode.
  // (cv2/torchvision decode at full size then resize; this is the native
  // tier's main win.)
  {
    unsigned denom = 1;
    while (denom < 8 &&
           cinfo.image_width / (denom * 2) >= static_cast<unsigned>(out_w) &&
           cinfo.image_height / (denom * 2) >= static_cast<unsigned>(out_h)) {
      denom *= 2;
    }
    cinfo.scale_num = 1;
    cinfo.scale_denom = denom;
  }
  jpeg_start_decompress(&cinfo);
  const int w = cinfo.output_width, h = cinfo.output_height;
  const int c = cinfo.output_components;  // 3 for RGB
  std::vector<uint8_t> pixels(static_cast<size_t>(w) * h * c);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t *row = pixels.data() + static_cast<size_t>(cinfo.output_scanline) * w * c;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  if (c != 3) return false;
  resize_bilinear_u8(pixels.data(), h, w, 3, out, out_h, out_w);
  return true;
}

struct PngReadState {
  const uint8_t *data;
  size_t size;
  size_t offset;
};

void png_read_fn(png_structp png, png_bytep out, png_size_t n) {
  auto *s = static_cast<PngReadState *>(png_get_io_ptr(png));
  if (s->offset + n > s->size) {
    png_error(png, "read past end");
    return;
  }
  std::memcpy(out, s->data + s->offset, n);
  s->offset += n;
}

template <typename OutT>
bool decode_png_gray_one(const uint8_t *blob, size_t size, int out_h,
                         int out_w, OutT *out) {
  if (size < 8 || png_sig_cmp(blob, 0, 8)) return false;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  PngReadState state{blob, size, 0};
  png_set_read_fn(png, &state, png_read_fn);
  png_read_info(png, info);

  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr,
               nullptr);
  // Normalize to 8-bit grayscale.
  if (color_type & PNG_COLOR_MASK_COLOR) png_set_rgb_to_gray(png, 1, -1, -1);
  if (color_type & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  if (bit_depth == 16) png_set_strip_16(png);
  if (bit_depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  png_read_update_info(png, info);

  std::vector<uint8_t> pixels(static_cast<size_t>(w) * h);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; ++y)
    rows[y] = pixels.data() + static_cast<size_t>(y) * w;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);

  resize_bilinear_u8(pixels.data(), static_cast<int>(h),
                     static_cast<int>(w), 1, out, out_h, out_w);
  return true;
}

template <typename OutT, typename Fn>
int run_batch(const uint8_t **blobs, const int64_t *sizes, int n, int out_h,
              int out_w, int channels, OutT *out, Fn decode_one,
              int num_threads, uint8_t *ok_out) {
  std::atomic<int> next{0}, ok{0};
  const size_t stride = static_cast<size_t>(out_h) * out_w * channels;
  auto worker = [&] {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      OutT *dst = out + static_cast<size_t>(i) * stride;
      bool good = decode_one(blobs[i], static_cast<size_t>(sizes[i]), out_h,
                             out_w, dst);
      if (good) {
        ok.fetch_add(1);
      } else {
        std::memset(dst, 0, stride * sizeof(OutT));
      }
      if (ok_out) ok_out[i] = good ? 1 : 0;
    }
  };
  int t = std::max(1, std::min(num_threads, n));
  std::vector<std::thread> threads;
  threads.reserve(t);
  for (int i = 0; i < t; ++i) threads.emplace_back(worker);
  for (auto &th : threads) th.join();
  return ok.load();
}

}  // namespace

extern "C" {

int pd_decode_jpeg_batch(const uint8_t **blobs, const int64_t *sizes, int n,
                         int out_h, int out_w, float *out, int num_threads,
                         uint8_t *ok_out) {
  return run_batch(blobs, sizes, n, out_h, out_w, 3, out,
                   decode_jpeg_one<float>, num_threads, ok_out);
}

int pd_decode_png_gray_batch(const uint8_t **blobs, const int64_t *sizes,
                             int n, int out_h, int out_w, float *out,
                             int num_threads, uint8_t *ok_out) {
  return run_batch(blobs, sizes, n, out_h, out_w, 1, out,
                   decode_png_gray_one<float>, num_threads, ok_out);
}

int pd_decode_jpeg_batch_u8(const uint8_t **blobs, const int64_t *sizes,
                            int n, int out_h, int out_w, uint8_t *out,
                            int num_threads, uint8_t *ok_out) {
  return run_batch(blobs, sizes, n, out_h, out_w, 3, out,
                   decode_jpeg_one<uint8_t>, num_threads, ok_out);
}

int pd_decode_png_gray_batch_u8(const uint8_t **blobs, const int64_t *sizes,
                                int n, int out_h, int out_w, uint8_t *out,
                                int num_threads, uint8_t *ok_out) {
  return run_batch(blobs, sizes, n, out_h, out_w, 1, out,
                   decode_png_gray_one<uint8_t>, num_threads, ok_out);
}

const char *pd_version() { return "posedec 0.1.0"; }

}  // extern "C"
