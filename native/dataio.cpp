// videomv_tpu native data loader.
//
// The reference feeds its training loop from Python DataLoader worker
// processes doing PIL decode + composite (tools/datasets/video_dataset.py
// _get_video_data).  Here the per-object hot path — 24 RGBA PNG decodes,
// background composite, box-filtered resize, float batch assembly — runs in
// C++ worker threads behind a ctypes boundary, so the single Python host
// process can keep the TPU fed without a process pool.
//
// Exposed C API (see videomv_tpu/data/native_loader.py):
//   mv_load_views(paths, n, out_size, bg255, rgb_out, mask_out, full_out,
//                 full_mask_out, full_size, n_threads) -> 0 | error count
//     rgb_out   float[n, out_size, out_size, 3]   composited, in [0,1]
//     mask_out  float[n, out_size, out_size, 1]   alpha in [0,1]
//     full_out  float[n, full_size, full_size, 3] (optional, may be null)
//     full_mask_out float[n, full_size, full_size, 1] (optional)
//
// Build: make -C native   (g++ + libpng + zlib, no other deps)

#include <png.h>

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct Image {
  std::vector<uint8_t> rgba;  // 4 channels
  int w = 0, h = 0;
  bool ok = false;
};

Image decode_png_rgba(const char* path) {
  Image img;
  FILE* fp = fopen(path, "rb");
  if (!fp) return img;

  png_byte header[8];
  if (fread(header, 1, 8, fp) != 8 || png_sig_cmp(header, 0, 8)) {
    fclose(fp);
    return img;
  }

  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (!png || !info || setjmp(png_jmpbuf(png))) {
    if (png) png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return img;
  }

  png_init_io(png, fp);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);

  img.w = png_get_image_width(png, info);
  img.h = png_get_image_height(png, info);
  png_byte color_type = png_get_color_type(png, info);
  png_byte bit_depth = png_get_bit_depth(png, info);

  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color_type == PNG_COLOR_TYPE_RGB || color_type == PNG_COLOR_TYPE_GRAY ||
      color_type == PNG_COLOR_TYPE_PALETTE)
    png_set_filler(png, 0xFF, PNG_FILLER_AFTER);
  if (color_type == PNG_COLOR_TYPE_GRAY || color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  png_read_update_info(png, info);

  img.rgba.resize(size_t(img.w) * img.h * 4);
  std::vector<png_bytep> rows(img.h);
  for (int y = 0; y < img.h; ++y) rows[y] = img.rgba.data() + size_t(y) * img.w * 4;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  img.ok = true;
  return img;
}

// box-filter resize of one RGBA image to (size × size), accumulating in float
void composite_resize(const Image& img, int size, float bg,
                      float* rgb_out, float* mask_out) {
  const double sx = double(img.w) / size;
  const double sy = double(img.h) / size;
  for (int oy = 0; oy < size; ++oy) {
    int y0 = int(oy * sy), y1 = int((oy + 1) * sy);
    if (y1 <= y0) y1 = y0 + 1;
    if (y1 > img.h) y1 = img.h;
    for (int ox = 0; ox < size; ++ox) {
      int x0 = int(ox * sx), x1 = int((ox + 1) * sx);
      if (x1 <= x0) x1 = x0 + 1;
      if (x1 > img.w) x1 = img.w;
      double r = 0, g = 0, b = 0, a = 0;
      int cnt = 0;
      for (int y = y0; y < y1; ++y) {
        const uint8_t* row = img.rgba.data() + (size_t(y) * img.w + x0) * 4;
        for (int x = x0; x < x1; ++x, row += 4) {
          r += row[0]; g += row[1]; b += row[2]; a += row[3];
          ++cnt;
        }
      }
      const double inv = 1.0 / (255.0 * cnt);
      const float fr = float(r * inv), fg = float(g * inv), fb = float(b * inv);
      const float fa = float(a * inv);
      float* px = rgb_out + (size_t(oy) * size + ox) * 3;
      px[0] = fr * fa + bg * (1.f - fa);
      px[1] = fg * fa + bg * (1.f - fa);
      px[2] = fb * fa + bg * (1.f - fa);
      mask_out[size_t(oy) * size + ox] = fa;
    }
  }
}

}  // namespace

extern "C" {

// returns the number of failed views (0 == success)
int mv_load_views(const char** paths, int n, int out_size, int bg255,
                  float* rgb_out, float* mask_out,
                  float* full_out, float* full_mask_out, int full_size,
                  int n_threads) {
  if (n_threads <= 0) n_threads = std::thread::hardware_concurrency();
  if (n_threads <= 0) n_threads = 1;
  std::atomic<int> next{0}, errors{0};
  const float bg = bg255 / 255.0f;

  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      Image img = decode_png_rgba(paths[i]);
      if (!img.ok) {
        errors.fetch_add(1);
        continue;
      }
      composite_resize(img, out_size, bg,
                       rgb_out + size_t(i) * out_size * out_size * 3,
                       mask_out + size_t(i) * out_size * out_size);
      if (full_out && full_mask_out && full_size > 0) {
        composite_resize(img, full_size, bg,
                         full_out + size_t(i) * full_size * full_size * 3,
                         full_mask_out + size_t(i) * full_size * full_size);
      }
    }
  };

  std::vector<std::thread> threads;
  const int nt = n_threads < n ? n_threads : n;
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return errors.load();
}

int mv_version() { return 1; }

}  // extern "C"
