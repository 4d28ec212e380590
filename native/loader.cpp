// gradslam-tpu native data loader.
//
// Host-side runtime component: threaded RGB-D frame loading (PNG/JPEG
// decode, resize, depth scaling) feeding the TPU input pipeline. The
// reference relies on Python imageio/cv2 inside DataLoader workers; this
// implements the decode+resize hot path natively with a persistent thread
// pool so a single process can saturate the host while the device computes.
//
// Exposed as a plain C ABI consumed via ctypes
// (gradslam_tpu/datasets/native_loader.py). No Python dependencies.
//
// Build: g++ -O3 -march=native -shared -fPIC loader.cpp -o libgsloader.so
//        -lpng -ljpeg -lpthread

#include <png.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

extern "C" {
#include <jpeglib.h>
}

namespace {

// ---------------------------------------------------------------------------
// Thread pool
// ---------------------------------------------------------------------------

class ThreadPool {
 public:
  explicit ThreadPool(int n) : stop_(false) {
    for (int i = 0; i < n; ++i) {
      workers_.emplace_back([this] {
        for (;;) {
          std::function<void()> job;
          {
            std::unique_lock<std::mutex> lk(mu_);
            cv_.wait(lk, [this] { return stop_ || !jobs_.empty(); });
            if (stop_ && jobs_.empty()) return;
            job = std::move(jobs_.front());
            jobs_.pop();
          }
          job();
        }
      });
    }
  }

  ~ThreadPool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& w : workers_) w.join();
  }

  void submit(std::function<void()> job) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      jobs_.push(std::move(job));
    }
    cv_.notify_one();
  }

 private:
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> jobs_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_;
};

ThreadPool* pool() {
  static ThreadPool p(std::max(2u, std::thread::hardware_concurrency()));
  return &p;
}

// ---------------------------------------------------------------------------
// Decoders
// ---------------------------------------------------------------------------

// Decodes an 8-bit PNG/JPEG color image to RGB u8. Returns 0 on success.
int decode_color(const char* path, std::vector<uint8_t>* out, int* h, int* w) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  uint8_t magic[8] = {0};
  if (fread(magic, 1, 8, f) != 8) {
    fclose(f);
    return 2;
  }
  rewind(f);
  if (!png_sig_cmp(magic, 0, 8)) {
    // PNG path
    png_structp png =
        png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
    png_infop info = png_create_info_struct(png);
    if (setjmp(png_jmpbuf(png))) {
      png_destroy_read_struct(&png, &info, nullptr);
      fclose(f);
      return 3;
    }
    png_init_io(png, f);
    png_read_info(png, info);
    *w = png_get_image_width(png, info);
    *h = png_get_image_height(png, info);
    int color = png_get_color_type(png, info);
    int depth = png_get_bit_depth(png, info);
    if (depth == 16) png_set_strip_16(png);
    if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
    if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
      png_set_gray_to_rgb(png);
    if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
    png_set_strip_alpha(png);
    png_read_update_info(png, info);
    out->resize(size_t(*h) * *w * 3);
    std::vector<png_bytep> rows(*h);
    for (int y = 0; y < *h; ++y) rows[y] = out->data() + size_t(y) * *w * 3;
    png_read_image(png, rows.data());
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return 0;
  }
  if (magic[0] == 0xFF && magic[1] == 0xD8) {
    // JPEG path
    jpeg_decompress_struct cinfo;
    jpeg_error_mgr jerr;
    cinfo.err = jpeg_std_error(&jerr);
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, f);
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = JCS_RGB;
    jpeg_start_decompress(&cinfo);
    *w = cinfo.output_width;
    *h = cinfo.output_height;
    out->resize(size_t(*h) * *w * 3);
    while (cinfo.output_scanline < cinfo.output_height) {
      uint8_t* row = out->data() + size_t(cinfo.output_scanline) * *w * 3;
      jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return 0;
  }
  fclose(f);
  return 4;  // unknown format
}

// Decodes a 16-bit grayscale PNG (depth map) to u16. Returns 0 on success.
int decode_depth16(const char* path, std::vector<uint16_t>* out, int* h, int* w) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return 3;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  *w = png_get_image_width(png, info);
  *h = png_get_image_height(png, info);
  int color = png_get_color_type(png, info);
  int depth = png_get_bit_depth(png, info);
  if (color != PNG_COLOR_TYPE_GRAY) png_set_rgb_to_gray(png, 1, -1, -1);
  if (depth < 16) png_set_expand_16(png);
  // PNG stores 16-bit big-endian; convert to host little-endian
  png_set_swap(png);
  png_read_update_info(png, info);
  out->resize(size_t(*h) * *w);
  std::vector<png_bytep> rows(*h);
  for (int y = 0; y < *h; ++y)
    rows[y] = reinterpret_cast<png_bytep>(out->data() + size_t(y) * *w);
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(f);
  return 0;
}

// ---------------------------------------------------------------------------
// Resizers (bilinear for color, nearest for depth — matching the loaders'
// cv2.INTER_LINEAR / INTER_NEAREST semantics)
// ---------------------------------------------------------------------------

// Precomputed 1D interpolation taps (pixel-center mapping, matching
// cv2.resize INTER_LINEAR).
struct Taps {
  std::vector<int> i0, i1;
  std::vector<float> w;  // weight of i1
};

Taps make_taps(int s, int d) {
  Taps t;
  t.i0.resize(d);
  t.i1.resize(d);
  t.w.resize(d);
  const float r = d > 0 ? float(s) / d : 0.f;
  for (int x = 0; x < d; ++x) {
    float fx = (x + 0.5f) * r - 0.5f;
    int x0 = (int)fx;
    if (fx < 0) x0 = 0;
    float wx = fx - x0;
    if (wx < 0) wx = 0;
    t.i0[x] = x0;
    t.i1[x] = std::min(x0 + 1, s - 1);
    t.w[x] = wx;
  }
  return t;
}

// Separable bilinear resize (horizontal then vertical pass — sequential
// memory access, vectorizable inner loops).
void resize_bilinear_rgb_to_f32(const uint8_t* src, int sh, int sw, float* dst,
                                int dh, int dw, float scale) {
  if (sh == dh && sw == dw) {
    const size_t n = size_t(sh) * sw * 3;
    for (size_t i = 0; i < n; ++i) dst[i] = float(src[i]) * scale;
    return;
  }
  Taps tx = make_taps(sw, dw);
  Taps ty = make_taps(sh, dh);
  // horizontal pass: (sh, sw, 3) u8 -> (sh, dw, 3) f32
  std::vector<float> tmp(size_t(sh) * dw * 3);
  for (int y = 0; y < sh; ++y) {
    const uint8_t* row = src + size_t(y) * sw * 3;
    float* out = tmp.data() + size_t(y) * dw * 3;
    for (int x = 0; x < dw; ++x) {
      const uint8_t* a = row + tx.i0[x] * 3;
      const uint8_t* b = row + tx.i1[x] * 3;
      const float w = tx.w[x];
      out[x * 3 + 0] = a[0] + (float(b[0]) - a[0]) * w;
      out[x * 3 + 1] = a[1] + (float(b[1]) - a[1]) * w;
      out[x * 3 + 2] = a[2] + (float(b[2]) - a[2]) * w;
    }
  }
  // vertical pass: (sh, dw, 3) -> (dh, dw, 3), contiguous row blend
  const int rw = dw * 3;
  for (int y = 0; y < dh; ++y) {
    const float* a = tmp.data() + size_t(ty.i0[y]) * rw;
    const float* b = tmp.data() + size_t(ty.i1[y]) * rw;
    const float w = ty.w[y];
    float* out = dst + size_t(y) * rw;
    for (int x = 0; x < rw; ++x) out[x] = (a[x] + (b[x] - a[x]) * w) * scale;
  }
}

void resize_nearest_u16_to_f32(const uint16_t* src, int sh, int sw, float* dst,
                               int dh, int dw, float scale) {
  for (int y = 0; y < dh; ++y) {
    int sy = std::min(int(float(y) * sh / dh), sh - 1);
    for (int x = 0; x < dw; ++x) {
      int sx = std::min(int(float(x) * sw / dw), sw - 1);
      dst[size_t(y) * dw + x] = float(src[size_t(sy) * sw + sx]) * scale;
    }
  }
}

int load_one_color(const char* path, float* dst, int dh, int dw, float scale) {
  std::vector<uint8_t> buf;
  int sh, sw;
  int rc = decode_color(path, &buf, &sh, &sw);
  if (rc) return rc;
  resize_bilinear_rgb_to_f32(buf.data(), sh, sw, dst, dh, dw, scale);
  return 0;
}

int load_one_depth(const char* path, float* dst, int dh, int dw, float scale) {
  std::vector<uint16_t> buf;
  int sh, sw;
  int rc = decode_depth16(path, &buf, &sh, &sw);
  if (rc) return rc;
  resize_nearest_u16_to_f32(buf.data(), sh, sw, dst, dh, dw, scale);
  return 0;
}

}  // namespace

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------

extern "C" {

// Loads n color images into out (n, h, w, 3) float32, scaled by `scale`
// (1.0 for raw 0-255, 1/255 for normalized). Returns 0 on success, else
// the 1-based index of the first failing file.
int gs_load_color_batch(const char** paths, int n, float* out, int h, int w,
                        float scale) {
  std::atomic<int> err{0};
  std::atomic<int> done{0};
  std::mutex mu;
  std::condition_variable cv;
  for (int i = 0; i < n; ++i) {
    pool()->submit([=, &err, &done, &mu, &cv] {
      int rc = load_one_color(paths[i], out + size_t(i) * h * w * 3, h, w, scale);
      if (rc) {
        int expected = 0;
        err.compare_exchange_strong(expected, i + 1);
      }
      {
        std::lock_guard<std::mutex> lk(mu);
        ++done;
      }
      cv.notify_one();
    });
  }
  std::unique_lock<std::mutex> lk(mu);
  cv.wait(lk, [&] { return done.load() == n; });
  return err.load();
}

// Loads n 16-bit depth PNGs into out (n, h, w, 1) float32, scaled by
// 1/depth_scale. Returns 0 on success, else 1-based failing index.
int gs_load_depth_batch(const char** paths, int n, float* out, int h, int w,
                        float inv_depth_scale) {
  std::atomic<int> err{0};
  std::atomic<int> done{0};
  std::mutex mu;
  std::condition_variable cv;
  for (int i = 0; i < n; ++i) {
    pool()->submit([=, &err, &done, &mu, &cv] {
      int rc = load_one_depth(paths[i], out + size_t(i) * h * w, h, w,
                              inv_depth_scale);
      if (rc) {
        int expected = 0;
        err.compare_exchange_strong(expected, i + 1);
      }
      {
        std::lock_guard<std::mutex> lk(mu);
        ++done;
      }
      cv.notify_one();
    });
  }
  std::unique_lock<std::mutex> lk(mu);
  cv.wait(lk, [&] { return done.load() == n; });
  return err.load();
}

int gs_loader_version() { return 1; }

}  // extern "C"
