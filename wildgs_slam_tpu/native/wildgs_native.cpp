// wildgs_native: native runtime components (C++17, pthreads, libpng/libjpeg).
//
// The reference framework's data path is synchronous Python/cv2 inside the
// tracking loop (src/utils/datasets.py get_color / depthloader); its PLY
// export serializes through numpy (gaussian_model.py:352-390). This library
// provides the TPU build's native equivalents:
//
//   * a prefetching frame loader: a worker pool decodes + bilinearly
//     resizes PNG/JPEG frames ahead of the SLAM loop into an LRU cache so
//     the host loop never blocks on disk/decode;
//   * 16-bit PNG depth decoding with scale;
//   * a binary little-endian PLY writer for large Gaussian maps.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 dependency).

#include <png.h>
#include <jpeglib.h>

#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <map>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Image {
  int w = 0, h = 0, c = 0;
  std::vector<float> data;  // HWC float
};

// ---------------------------------------------------------------- decoding

bool decode_png(const char* path, Image* out, bool depth16, float scale) {
  FILE* fp = fopen(path, "rb");
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
  int bit_depth = png_get_bit_depth(png, info);
  int color_type = png_get_color_type(png, info);

  if (depth16) {
    // 16-bit grayscale depth; big-endian in PNG
    if (color_type != PNG_COLOR_TYPE_GRAY) png_set_rgb_to_gray(png, 1, -1, -1);
    png_read_update_info(png, info);
    std::vector<uint8_t> row(png_get_rowbytes(png, info));
    out->w = w; out->h = h; out->c = 1;
    out->data.resize((size_t)w * h);
    for (png_uint_32 y = 0; y < h; y++) {
      png_read_row(png, row.data(), nullptr);
      for (png_uint_32 x = 0; x < w; x++) {
        uint16_t v = bit_depth == 16
                         ? (uint16_t)((row[2 * x] << 8) | row[2 * x + 1])
                         : row[x];
        out->data[(size_t)y * w + x] = (float)v / scale;
      }
    }
  } else {
    if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
    if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
      png_set_expand_gray_1_2_4_to_8(png);
    if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
    if (bit_depth == 16) png_set_strip_16(png);
    if (color_type == PNG_COLOR_TYPE_GRAY ||
        color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
      png_set_gray_to_rgb(png);
    png_set_strip_alpha(png);
    png_read_update_info(png, info);
    std::vector<uint8_t> row(png_get_rowbytes(png, info));
    out->w = w; out->h = h; out->c = 3;
    out->data.resize((size_t)w * h * 3);
    for (png_uint_32 y = 0; y < h; y++) {
      png_read_row(png, row.data(), nullptr);
      for (png_uint_32 x = 0; x < w * 3; x++)
        out->data[(size_t)y * w * 3 + x] = row[x] / 255.0f;
    }
  }
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  return true;
}

bool decode_jpeg(const char* path, Image* out) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return false;
  jpeg_decompress_struct cinfo;
  jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  int w = cinfo.output_width, h = cinfo.output_height;
  out->w = w; out->h = h; out->c = 3;
  out->data.resize((size_t)w * h * 3);
  std::vector<uint8_t> row((size_t)w * 3);
  uint8_t* rptr = row.data();
  for (int y = 0; y < h; y++) {
    jpeg_read_scanlines(&cinfo, &rptr, 1);
    for (int x = 0; x < w * 3; x++)
      out->data[(size_t)y * w * 3 + x] = row[x] / 255.0f;
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(fp);
  return true;
}

bool has_suffix(const std::string& s, const char* suf) {
  size_t n = strlen(suf);
  if (s.size() < n) return false;
  std::string tail = s.substr(s.size() - n);
  for (auto& ch : tail) ch = tolower(ch);
  return tail == suf;
}

// bilinear resize HWC float (nearest for depth to avoid edge mixing)
void resize_img(const Image& src, int ow, int oh, bool nearest, float* out) {
  int c = src.c;
  for (int y = 0; y < oh; y++) {
    float fy = (y + 0.5f) * src.h / oh - 0.5f;
    int y0 = (int)floorf(fy);
    float wy = fy - y0;
    int y0c = y0 < 0 ? 0 : (y0 >= src.h ? src.h - 1 : y0);
    int y1c = y0 + 1 < 0 ? 0 : (y0 + 1 >= src.h ? src.h - 1 : y0 + 1);
    for (int x = 0; x < ow; x++) {
      float fx = (x + 0.5f) * src.w / ow - 0.5f;
      int x0 = (int)floorf(fx);
      float wx = fx - x0;
      int x0c = x0 < 0 ? 0 : (x0 >= src.w ? src.w - 1 : x0);
      int x1c = x0 + 1 < 0 ? 0 : (x0 + 1 >= src.w ? src.w - 1 : x0 + 1);
      for (int k = 0; k < c; k++) {
        float v;
        if (nearest) {
          int yn = wy < 0.5f ? y0c : y1c;
          int xn = wx < 0.5f ? x0c : x1c;
          v = src.data[((size_t)yn * src.w + xn) * c + k];
        } else {
          float v00 = src.data[((size_t)y0c * src.w + x0c) * c + k];
          float v01 = src.data[((size_t)y0c * src.w + x1c) * c + k];
          float v10 = src.data[((size_t)y1c * src.w + x0c) * c + k];
          float v11 = src.data[((size_t)y1c * src.w + x1c) * c + k];
          v = (1 - wy) * ((1 - wx) * v00 + wx * v01) +
              wy * ((1 - wx) * v10 + wx * v11);
        }
        out[((size_t)y * ow + x) * c + k] = v;
      }
    }
  }
}

// ---------------------------------------------------------------- loader

struct Loader {
  std::vector<std::string> paths;
  int out_w, out_h;
  bool depth;
  float depth_scale;
  int lookahead;
  size_t cache_cap;

  std::mutex mu;
  std::condition_variable cv;
  std::map<int, std::vector<float>> cache;   // decoded+resized frames
  std::deque<int> lru;
  std::deque<int> queue;                     // prefetch work
  std::vector<std::thread> workers;
  std::atomic<bool> stop{false};
  std::map<int, bool> inflight;

  size_t frame_floats() const {
    return (size_t)out_w * out_h * (depth ? 1 : 3);
  }

  bool produce(int idx, std::vector<float>* out) {
    Image img;
    const std::string& p = paths[idx];
    bool ok = false;
    if (has_suffix(p, ".png"))
      ok = decode_png(p.c_str(), &img, depth, depth_scale);
    else if (has_suffix(p, ".jpg") || has_suffix(p, ".jpeg"))
      ok = decode_jpeg(p.c_str(), &img);
    if (!ok) return false;
    out->resize(frame_floats());
    resize_img(img, out_w, out_h, depth, out->data());
    return true;
  }

  void put(int idx, std::vector<float>&& data) {
    std::lock_guard<std::mutex> lk(mu);
    if (!cache.count(idx)) {
      cache[idx] = std::move(data);
      lru.push_back(idx);
      while (lru.size() > cache_cap) {
        cache.erase(lru.front());
        lru.pop_front();
      }
    }
    inflight.erase(idx);
    cv.notify_all();
  }

  void worker() {
    while (!stop.load()) {
      int idx = -1;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv.wait(lk, [&] { return stop.load() || !queue.empty(); });
        if (stop.load()) return;
        idx = queue.front();
        queue.pop_front();
        if (cache.count(idx)) { inflight.erase(idx); continue; }
      }
      std::vector<float> buf;
      if (produce(idx, &buf)) put(idx, std::move(buf));
      else put(idx, std::vector<float>(frame_floats(), 0.0f));
    }
  }

  void schedule(int idx) {
    std::lock_guard<std::mutex> lk(mu);
    for (int i = idx; i < idx + lookahead && i < (int)paths.size(); i++) {
      if (!cache.count(i) && !inflight.count(i)) {
        inflight[i] = true;
        queue.push_back(i);
      }
    }
    cv.notify_all();
  }
};

}  // namespace

extern "C" {

void* wn_loader_create(const char** paths, int n, int out_w, int out_h,
                       int n_threads, int is_depth, float depth_scale,
                       int lookahead) {
  auto* l = new Loader();
  l->paths.assign(paths, paths + n);
  l->out_w = out_w;
  l->out_h = out_h;
  l->depth = is_depth != 0;
  l->depth_scale = depth_scale;
  l->lookahead = lookahead > 0 ? lookahead : 4;
  l->cache_cap = l->lookahead * 2 + 4;
  for (int i = 0; i < (n_threads > 0 ? n_threads : 2); i++)
    l->workers.emplace_back(&Loader::worker, l);
  return l;
}

// Blocking fetch of frame idx into out (out_h*out_w*C floats); kicks off
// prefetch of the following frames. Returns 1 on success.
int wn_loader_get(void* handle, int idx, float* out) {
  auto* l = (Loader*)handle;
  if (idx < 0 || idx >= (int)l->paths.size()) return 0;
  l->schedule(idx);
  std::unique_lock<std::mutex> lk(l->mu);
  l->cv.wait(lk, [&] { return l->cache.count(idx) || l->stop.load(); });
  if (!l->cache.count(idx)) return 0;
  auto& v = l->cache[idx];
  memcpy(out, v.data(), v.size() * sizeof(float));
  lk.unlock();
  l->schedule(idx + 1);
  return 1;
}

void wn_loader_destroy(void* handle) {
  auto* l = (Loader*)handle;
  l->stop.store(true);
  l->cv.notify_all();
  for (auto& t : l->workers) t.join();
  delete l;
}

// Binary little-endian PLY writer: data is (n, n_props) row-major float32.
int wn_write_ply(const char* path, const float* data, long n, int n_props,
                 const char** prop_names) {
  FILE* fp = fopen(path, "wb");
  if (!fp) return 0;
  fprintf(fp, "ply\nformat binary_little_endian 1.0\nelement vertex %ld\n", n);
  for (int i = 0; i < n_props; i++)
    fprintf(fp, "property float %s\n", prop_names[i]);
  fprintf(fp, "end_header\n");
  size_t written = fwrite(data, sizeof(float), (size_t)n * n_props, fp);
  fclose(fp);
  return written == (size_t)n * n_props ? 1 : 0;
}

int wn_read_image(const char* path, int out_w, int out_h, float* out) {
  Image img;
  bool ok = false;
  std::string p(path);
  if (has_suffix(p, ".png")) ok = decode_png(path, &img, false, 1.0f);
  else if (has_suffix(p, ".jpg") || has_suffix(p, ".jpeg"))
    ok = decode_jpeg(path, &img);
  if (!ok) return 0;
  resize_img(img, out_w, out_h, false, out);
  return 1;
}

int wn_read_depth16(const char* path, int out_w, int out_h, float scale,
                    float* out) {
  Image img;
  if (!decode_png(path, &img, true, scale)) return 0;
  resize_img(img, out_w, out_h, true, out);
  return 1;
}

}  // extern "C"
