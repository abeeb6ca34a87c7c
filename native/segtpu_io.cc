// segtpu native IO: PNG/JPEG decode + threaded prefetch ring.
//
// The reference's data plane is Python (cv2/PIL decode inside fork-worker
// DataLoaders, SURVEY.md §2#7/§3.2). For TPU streaming inference and
// proxy-training input rates, Python-side decode becomes the bottleneck
// once the device step is ~10 ms/batch; this library moves decode and
// read-ahead into C++ threads (GIL-free), exposed to Python via ctypes
// (segtpu/data/native_io.py) with a PIL fallback when the .so is absent.
//
// C API (all returns: 0 ok / negative errno-style):
//   image_info(path, &h, &w, &c)            probe dimensions
//   decode_image(path, out, out_cap)        RGB8 (c=3) or L8 (c=1), HWC
//   pf_create(paths[], n, threads, ahead)   prefetcher over a path list
//   pf_next(pf, &buf, &h, &w, &c)           blocking; buf owned by callee
//                                           until the next pf_next/destroy
//   pf_destroy(pf)
//
// Build: make -C native   ->  native/libsegtpu_io.so

#include <png.h>
#include <jpeglib.h>

#include <atomic>
#include <condition_variable>
#include <csetjmp>
#include <cstdio>
#include <cstdint>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Image {
  int h = 0, w = 0, c = 0;
  std::vector<uint8_t> data;
  bool ok = false;
};

bool has_suffix(const std::string& s, const char* suf) {
  std::string t = s;
  for (auto& ch : t) ch = static_cast<char>(tolower(ch));
  std::string x(suf);
  return t.size() >= x.size() && t.compare(t.size() - x.size(), x.size(), x) == 0;
}

// ---------------------------------------------------------------- PNG --

Image decode_png(const char* path) {
  Image im;
  FILE* fp = fopen(path, "rb");
  if (!fp) return im;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  png_infop info = png ? png_create_info_struct(png) : nullptr;
  if (!png || !info || setjmp(png_jmpbuf(png))) {
    if (png) png_destroy_read_struct(&png, info ? &info : nullptr, nullptr);
    fclose(fp);
    return im;
  }
  png_init_io(png, fp);
  png_read_info(png, info);
  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr,
               nullptr);
  if (bit_depth == 16) png_set_strip_16(png);
  // Segmentation masks are palette/gray class-index PNGs: keep them
  // single-channel (palette index = class id, the reference convention).
  bool gray = (color_type == PNG_COLOR_TYPE_GRAY ||
               color_type == PNG_COLOR_TYPE_PALETTE);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (color_type == PNG_COLOR_TYPE_RGB_ALPHA ||
      color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_strip_alpha(png);
  if (color_type == PNG_COLOR_TYPE_RGB ||
      color_type == PNG_COLOR_TYPE_RGB_ALPHA)
    gray = false;
  png_read_update_info(png, info);
  int channels = gray ? 1 : static_cast<int>(png_get_channels(png, info));
  if (!gray && channels != 3) {  // normalize anything odd to RGB
    channels = static_cast<int>(png_get_channels(png, info));
  }
  im.h = static_cast<int>(h);
  im.w = static_cast<int>(w);
  im.c = channels;
  im.data.resize(static_cast<size_t>(h) * w * channels);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; ++y)
    rows[y] = im.data.data() + static_cast<size_t>(y) * w * channels;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  im.ok = true;
  return im;
}

// --------------------------------------------------------------- JPEG --

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  longjmp(reinterpret_cast<JpegErr*>(cinfo->err)->jb, 1);
}

Image decode_jpeg(const char* path) {
  Image im;
  FILE* fp = fopen(path, "rb");
  if (!fp) return im;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(fp);
    return im;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  im.h = static_cast<int>(cinfo.output_height);
  im.w = static_cast<int>(cinfo.output_width);
  im.c = 3;
  im.data.resize(static_cast<size_t>(im.h) * im.w * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = im.data.data() +
                   static_cast<size_t>(cinfo.output_scanline) * im.w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(fp);
  im.ok = true;
  return im;
}

Image decode_any(const char* path) {
  std::string p(path);
  if (has_suffix(p, ".jpg") || has_suffix(p, ".jpeg")) return decode_jpeg(path);
  return decode_png(path);
}

// ---------------------------------------------------------- prefetcher --

struct Prefetcher {
  std::vector<std::string> paths;
  std::vector<Image> slots;        // decoded images by absolute index
  std::vector<bool> filled;
  size_t next_submit = 0;          // next path index to decode
  size_t next_emit = 0;            // next index the consumer expects
  std::mutex mu;
  std::condition_variable cv_ready, cv_space;
  size_t lookahead;
  std::atomic<bool> stop{false};
  std::vector<std::thread> workers;
  Image current;  // buffer handed to Python, owned until next pf_next

  // each worker claims an index, decodes GIL-free, then parks the result
  // in its slot; read-ahead is bounded by `lookahead` past the consumer
  void work() {
    for (;;) {
      size_t idx;
      {
        std::lock_guard<std::mutex> g(mu);
        if (stop || next_submit >= paths.size()) return;
        idx = next_submit++;
      }
      Image im = decode_any(paths[idx].c_str());
      std::unique_lock<std::mutex> g(mu);
      cv_space.wait(g, [&] { return stop || idx < next_emit + lookahead; });
      if (stop) return;
      slots[idx] = std::move(im);
      filled[idx] = true;
      cv_ready.notify_all();
    }
  }
};

}  // namespace

extern "C" {

int image_info(const char* path, int* h, int* w, int* c) {
  Image im = decode_any(path);
  if (!im.ok) return -1;
  *h = im.h;
  *w = im.w;
  *c = im.c;
  return 0;
}

int decode_image(const char* path, uint8_t* out, long long out_cap) {
  Image im = decode_any(path);
  if (!im.ok) return -1;
  long long need = static_cast<long long>(im.h) * im.w * im.c;
  if (need > out_cap) return -2;
  std::memcpy(out, im.data.data(), static_cast<size_t>(need));
  return 0;
}

void* pf_create(const char* const* paths, int n, int n_threads,
                int lookahead) {
  auto* pf = new Prefetcher();
  pf->paths.assign(paths, paths + n);
  pf->lookahead = lookahead > 0 ? lookahead : 4;
  pf->slots.resize(n);
  pf->filled.assign(n, false);
  int nt = n_threads > 0 ? n_threads : 2;
  for (int i = 0; i < nt; ++i)
    pf->workers.emplace_back([pf] { pf->work(); });
  return pf;
}

int pf_next(void* handle, uint8_t** buf, int* h, int* w, int* c) {
  auto* pf = static_cast<Prefetcher*>(handle);
  std::unique_lock<std::mutex> g(pf->mu);
  if (pf->next_emit >= pf->paths.size()) return 1;  // exhausted
  size_t idx = pf->next_emit;
  pf->cv_ready.wait(g, [&] { return pf->filled[idx]; });
  pf->current = std::move(pf->slots[idx]);
  pf->next_emit++;
  pf->cv_space.notify_all();
  if (!pf->current.ok) return -1;
  *buf = pf->current.data.data();
  *h = pf->current.h;
  *w = pf->current.w;
  *c = pf->current.c;
  return 0;
}

void pf_destroy(void* handle) {
  auto* pf = static_cast<Prefetcher*>(handle);
  {
    std::lock_guard<std::mutex> g(pf->mu);
    pf->stop = true;
  }
  pf->cv_space.notify_all();
  pf->cv_ready.notify_all();
  for (auto& t : pf->workers) t.join();
  delete pf;
}

}  // extern "C"
