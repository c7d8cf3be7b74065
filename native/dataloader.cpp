// Native prefetching image loader for the SLAM pipeline.
//
// The reference's dataset drivers call cv::imread synchronously in the main
// loop (`/root/reference/Examples/Monocular/mono_fisheye.cc:126-136`),
// stalling tracking on disk+decode. This loader decodes PNG/JPEG/PGM on a
// worker thread pool into a bounded ring buffer so the host pipeline always
// has the next frame ready — the data-loader role of the native runtime.
//
// C API (ctypes-friendly):
//   handle = slam_loader_create(paths, n_paths, n_threads, queue_cap)
//   slam_loader_next(handle, out_f32, max_bytes, &w, &h) -> index or -1
//   slam_loader_destroy(handle)
// Decoded output: grayscale float32, row-major.
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

struct Frame {
  int index = -1;
  int w = 0, h = 0;
  std::vector<float> data;
  bool ok = false;
};

bool ends_with(const std::string& s, const char* suf) {
  size_t n = strlen(suf);
  if (s.size() < n) return false;
  for (size_t i = 0; i < n; ++i) {
    char a = s[s.size() - n + i];
    char b = suf[i];
    if (tolower(a) != tolower(b)) return false;
  }
  return true;
}

bool decode_png(const std::string& path, Frame* out) {
  FILE* fp = fopen(path.c_str(), "rb");
  if (!fp) return false;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return false;
  }
  png_init_io(png, fp);
  png_read_info(png, info);
  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  int depth = png_get_bit_depth(png, info);
  int color = png_get_color_type(png, info);
  // normalize to 8-bit gray
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (depth == 16) png_set_strip_16(png);
  if (color & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  if (color == PNG_COLOR_TYPE_RGB || color == PNG_COLOR_TYPE_PALETTE ||
      color == PNG_COLOR_TYPE_RGB_ALPHA)
    png_set_rgb_to_gray_fixed(png, 1, -1, -1);
  png_read_update_info(png, info);
  std::vector<uint8_t> row(png_get_rowbytes(png, info));
  out->w = (int)w;
  out->h = (int)h;
  out->data.resize((size_t)w * h);
  for (png_uint_32 y = 0; y < h; ++y) {
    png_read_row(png, row.data(), nullptr);
    for (png_uint_32 x = 0; x < w; ++x)
      out->data[(size_t)y * w + x] = (float)row[x];
  }
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  return true;
}

bool decode_jpeg(const std::string& path, Frame* out) {
  FILE* fp = fopen(path.c_str(), "rb");
  if (!fp) return false;
  jpeg_decompress_struct cinfo;
  jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_GRAYSCALE;
  jpeg_start_decompress(&cinfo);
  int w = cinfo.output_width, h = cinfo.output_height;
  out->w = w;
  out->h = h;
  out->data.resize((size_t)w * h);
  std::vector<uint8_t> row(w);
  uint8_t* rp = row.data();
  while ((int)cinfo.output_scanline < h) {
    int y = cinfo.output_scanline;
    jpeg_read_scanlines(&cinfo, &rp, 1);
    for (int x = 0; x < w; ++x) out->data[(size_t)y * w + x] = (float)row[x];
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(fp);
  return true;
}

bool decode_pgm(const std::string& path, Frame* out) {
  FILE* fp = fopen(path.c_str(), "rb");
  if (!fp) return false;
  char magic[3] = {0};
  int w, h, maxv;
  if (fscanf(fp, "%2s %d %d %d", magic, &w, &h, &maxv) != 4 ||
      strcmp(magic, "P5") != 0) {
    fclose(fp);
    return false;
  }
  fgetc(fp);  // single whitespace
  out->w = w;
  out->h = h;
  out->data.resize((size_t)w * h);
  if (maxv < 256) {
    std::vector<uint8_t> buf((size_t)w * h);
    if (fread(buf.data(), 1, buf.size(), fp) != buf.size()) {
      fclose(fp);
      return false;
    }
    for (size_t i = 0; i < buf.size(); ++i) out->data[i] = (float)buf[i];
  } else {
    std::vector<uint16_t> buf((size_t)w * h);
    if (fread(buf.data(), 2, (size_t)w * h, fp) != (size_t)w * h) {
      fclose(fp);
      return false;
    }
    for (size_t i = 0; i < buf.size(); ++i) {
      uint16_t v = buf[i];
      out->data[i] = (float)((v >> 8) | (v << 8));  // big-endian
    }
  }
  fclose(fp);
  return true;
}

bool decode(const std::string& path, Frame* out) {
  if (ends_with(path, ".png")) return decode_png(path, out);
  if (ends_with(path, ".jpg") || ends_with(path, ".jpeg"))
    return decode_jpeg(path, out);
  if (ends_with(path, ".pgm")) return decode_pgm(path, out);
  return false;
}

struct Loader {
  std::vector<std::string> paths;
  size_t queue_cap;
  std::deque<Frame> ready;       // ordered by index
  std::mutex mu;
  std::condition_variable cv_ready, cv_space;
  std::atomic<int> next_to_decode{0};
  int next_to_emit = 0;
  std::atomic<bool> stop{false};
  std::vector<std::thread> workers;

  void worker() {
    while (!stop.load()) {
      int idx = next_to_decode.fetch_add(1);
      if (idx >= (int)paths.size()) return;
      {
        // bound the decode-ahead WINDOW (not the queue): the frame the
        // consumer waits for is always inside the window, so it can never
        // be blocked on space — no out-of-order deadlock.
        std::unique_lock<std::mutex> lk(mu);
        cv_space.wait(lk, [&] {
          return stop.load() || idx < next_to_emit + (int)queue_cap;
        });
        if (stop.load()) return;
      }
      Frame f;
      f.index = idx;
      f.ok = decode(paths[idx], &f);
      std::unique_lock<std::mutex> lk(mu);
      // insert ordered by index
      auto it = ready.begin();
      while (it != ready.end() && it->index < f.index) ++it;
      ready.insert(it, std::move(f));
      cv_ready.notify_all();
    }
  }
};

}  // namespace

extern "C" {

void* slam_loader_create(const char** paths, int n_paths, int n_threads,
                         int queue_cap) {
  auto* L = new Loader();
  L->paths.assign(paths, paths + n_paths);
  L->queue_cap = queue_cap > 0 ? queue_cap : 8;
  int nt = n_threads > 0 ? n_threads : 2;
  for (int i = 0; i < nt; ++i)
    L->workers.emplace_back([L] { L->worker(); });
  return L;
}

// Returns the frame index (>=0), -1 at end of stream, -2 decode error,
// -3 buffer too small. On success writes w/h and the float32 pixels.
int slam_loader_next(void* handle, float* out, long long max_floats,
                     int* w, int* h) {
  auto* L = (Loader*)handle;
  if (L->next_to_emit >= (int)L->paths.size()) return -1;
  std::unique_lock<std::mutex> lk(L->mu);
  L->cv_ready.wait(lk, [&] {
    return !L->ready.empty() && L->ready.front().index == L->next_to_emit;
  });
  Frame f = std::move(L->ready.front());
  L->ready.pop_front();
  L->next_to_emit++;
  L->cv_space.notify_all();
  lk.unlock();
  if (!f.ok) return -2;
  if ((long long)f.data.size() > max_floats) return -3;
  memcpy(out, f.data.data(), f.data.size() * sizeof(float));
  *w = f.w;
  *h = f.h;
  return f.index;
}

void slam_loader_destroy(void* handle) {
  auto* L = (Loader*)handle;
  L->stop.store(true);
  L->cv_space.notify_all();
  L->cv_ready.notify_all();
  for (auto& t : L->workers) t.join();
  delete L;
}

}  // extern "C"
