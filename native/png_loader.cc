// Native data loader: multithreaded PNG decode into contiguous batches.
//
// The reference loads images one-by-one through matplotlib on the host
// (src/images.py:24-32). This loader decodes a directory's PNGs in
// parallel worker threads straight into one preallocated [N, H, W, C]
// uint8 tensor, ready for a single host->device transfer. Exposed to
// Python via a small C API (ctypes, no pybind11 dependency).
//
// Build: make -C native   (g++ -O3 -shared -fPIC, links libpng + pthread)

#include <png.h>

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct PngInfo {
  uint32_t height = 0;
  uint32_t width = 0;
  uint32_t channels = 0;  // channels AFTER normalization (see decode)
};

// Decode one PNG into `out` (row-major H*W*out_channels uint8).
// Normalization: palette -> RGB, 16-bit -> 8-bit, gray+alpha -> gray
// (alpha stripped), RGBA -> RGB when out_channels == 3.
bool decode_png(const char* path, uint8_t* out, uint32_t want_h,
                uint32_t want_w, uint32_t want_c, std::string* err) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) {
    *err = std::string("open failed: ") + path;
    return false;
  }
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png ? png_create_info_struct(png) : nullptr;
  if (!png || !info) {
    if (png) png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    *err = "libpng alloc failed";
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    *err = std::string("libpng decode error: ") + path;
    return false;
  }
  png_init_io(png, fp);
  png_read_info(png, info);

  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  int color = png_get_color_type(png, info);
  int depth = png_get_bit_depth(png, info);

  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  // strip alpha; we only ever want RGB or gray
  if (color & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  png_read_update_info(png, info);

  uint32_t ch = png_get_channels(png, info);
  if (h != want_h || w != want_w || ch != want_c) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    char buf[256];
    std::snprintf(buf, sizeof buf, "shape mismatch %s: got %ux%ux%u want %ux%ux%u",
                  path, h, w, ch, want_h, want_w, want_c);
    *err = buf;
    return false;
  }

  std::vector<png_bytep> rows(h);
  for (uint32_t y = 0; y < h; ++y) rows[y] = out + size_t(y) * w * ch;
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  return true;
}

thread_local std::string g_err;

}  // namespace

extern "C" {

// Probe one PNG's normalized (post-alpha-strip) shape. Returns 0 on success.
int roadseg_probe_png(const char* path, uint32_t* h, uint32_t* w,
                      uint32_t* c) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return 1;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png ? png_create_info_struct(png) : nullptr;
  if (!png || !info || setjmp(png_jmpbuf(png))) {
    if (png) png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return 2;
  }
  png_init_io(png, fp);
  png_read_info(png, info);
  int color = png_get_color_type(png, info);
  int depth = png_get_bit_depth(png, info);
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  png_read_update_info(png, info);
  *h = png_get_image_height(png, info);
  *w = png_get_image_width(png, info);
  *c = png_get_channels(png, info);
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  return 0;
}

// Decode `n` PNGs (NUL-separated `paths` buffer) into `out` [n, h, w, c]
// uint8 with `threads` workers. Returns 0 on success; on failure returns
// 1 and writes the first error into err_buf.
int roadseg_load_png_batch(const char* paths, int n, uint8_t* out,
                           uint32_t h, uint32_t w, uint32_t c, int threads,
                           char* err_buf, int err_len) {
  std::vector<const char*> files;
  const char* p = paths;
  for (int i = 0; i < n; ++i) {
    files.push_back(p);
    p += std::strlen(p) + 1;
  }
  std::atomic<int> next{0};
  std::atomic<bool> failed{false};
  std::string first_err;
  std::mutex err_mu;

  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n || failed.load()) return;
      std::string err;
      uint8_t* dst = out + size_t(i) * h * w * c;
      if (!decode_png(files[i], dst, h, w, c, &err)) {
        std::lock_guard<std::mutex> lock(err_mu);
        if (!failed.exchange(true)) first_err = err;
        return;
      }
    }
  };

  if (threads < 1) threads = 1;
  std::vector<std::thread> pool;
  for (int t = 0; t < threads; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();

  if (failed.load()) {
    std::snprintf(err_buf, err_len, "%s", first_err.c_str());
    return 1;
  }
  return 0;
}

}  // extern "C"
