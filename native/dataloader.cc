// Native asynchronous image data loader for the SLAM pipeline.
//
// Host-side runtime component replacing the reference's synchronous
// per-frame cv::imread calls (/root/reference/modules/datasets/*.cc) with a
// multithreaded decode-ahead pipeline: worker threads decode PNG/JPEG frames
// in sequence order into a bounded prefetch queue while the device consumes
// earlier frames. Exposed to Python via a plain C API (ctypes).
//
// Output frames are float32 grayscale (BT.601 luma), matching the
// preprocessing entry of the device pipeline.

#include <png.h>
#include <jpeglib.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <map>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Frame {
  int height = 0;
  int width = 0;
  std::vector<float> gray;
  bool ok = false;
};

bool HasSuffix(const std::string& s, const char* suf) {
  size_t n = strlen(suf);
  if (s.size() < n) return false;
  std::string tail = s.substr(s.size() - n);
  for (auto& c : tail) c = tolower(c);
  return tail == suf;
}

bool DecodePng(const std::string& path, Frame* out) {
  FILE* fp = fopen(path.c_str(), "rb");
  if (!fp) return false;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
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
  int color = png_get_color_type(png, info);
  int depth = png_get_bit_depth(png, info);

  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  png_set_strip_alpha(png);
  png_read_update_info(png, info);

  int channels = png_get_channels(png, info);
  std::vector<uint8_t> row(w * channels);
  out->height = h;
  out->width = w;
  out->gray.resize((size_t)h * w);

  for (png_uint_32 y = 0; y < h; ++y) {
    png_read_row(png, row.data(), nullptr);
    float* dst = out->gray.data() + (size_t)y * w;
    if (channels >= 3) {
      for (png_uint_32 x = 0; x < w; ++x) {
        const uint8_t* p = row.data() + (size_t)x * channels;
        dst[x] = 0.299f * p[0] + 0.587f * p[1] + 0.114f * p[2];
      }
    } else {
      for (png_uint_32 x = 0; x < w; ++x) dst[x] = row[x * channels];
    }
  }
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  out->ok = true;
  return true;
}

bool DecodeJpeg(const std::string& path, Frame* out) {
  FILE* fp = fopen(path.c_str(), "rb");
  if (!fp) return false;
  jpeg_decompress_struct cinfo;
  jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    fclose(fp);
    return false;
  }
  jpeg_start_decompress(&cinfo);
  int w = cinfo.output_width;
  int h = cinfo.output_height;
  int ch = cinfo.output_components;
  out->height = h;
  out->width = w;
  out->gray.resize((size_t)h * w);
  std::vector<uint8_t> row((size_t)w * ch);
  uint8_t* rp = row.data();
  while ((int)cinfo.output_scanline < h) {
    int y = cinfo.output_scanline;
    jpeg_read_scanlines(&cinfo, &rp, 1);
    float* dst = out->gray.data() + (size_t)y * w;
    if (ch >= 3) {
      for (int x = 0; x < w; ++x) {
        const uint8_t* p = row.data() + (size_t)x * ch;
        dst[x] = 0.299f * p[0] + 0.587f * p[1] + 0.114f * p[2];
      }
    } else {
      for (int x = 0; x < w; ++x) dst[x] = row[x];
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(fp);
  out->ok = true;
  return true;
}

bool Decode(const std::string& path, Frame* out) {
  if (HasSuffix(path, ".png")) return DecodePng(path, out);
  if (HasSuffix(path, ".jpg") || HasSuffix(path, ".jpeg"))
    return DecodeJpeg(path, out);
  return false;
}

class Loader {
 public:
  Loader(std::vector<std::string> paths, int n_threads, int capacity)
      : paths_(std::move(paths)), capacity_(capacity) {
    next_to_schedule_ = 0;
    next_to_emit_ = 0;
    stop_ = false;
    for (int i = 0; i < n_threads; ++i)
      workers_.emplace_back([this] { Work(); });
  }

  ~Loader() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_space_.notify_all();
    cv_ready_.notify_all();
    for (auto& t : workers_) t.join();
  }

  // Blocking pop of the next frame in sequence order.
  bool Next(Frame* out) {
    std::unique_lock<std::mutex> lk(mu_);
    int idx = next_to_emit_;
    if (idx >= (int)paths_.size()) return false;
    cv_ready_.wait(lk, [&] { return stop_ || done_.count(idx) > 0; });
    if (stop_ && done_.count(idx) == 0) return false;
    *out = std::move(done_[idx]);
    done_.erase(idx);
    next_to_emit_++;
    cv_space_.notify_all();
    return out->ok;
  }

  int size() const { return (int)paths_.size(); }

 private:
  void Work() {
    for (;;) {
      int idx;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_space_.wait(lk, [&] {
          return stop_ || (next_to_schedule_ < (int)paths_.size() &&
                           (int)done_.size() + in_flight_ < capacity_);
        });
        if (stop_ || next_to_schedule_ >= (int)paths_.size()) return;
        idx = next_to_schedule_++;
        in_flight_++;
      }
      Frame f;
      Decode(paths_[idx], &f);
      {
        std::lock_guard<std::mutex> lk(mu_);
        done_[idx] = std::move(f);
        in_flight_--;
      }
      cv_ready_.notify_all();
    }
  }

  std::vector<std::string> paths_;
  int capacity_;
  std::vector<std::thread> workers_;
  std::mutex mu_;
  std::condition_variable cv_space_, cv_ready_;
  std::map<int, Frame> done_;
  int next_to_schedule_;
  int next_to_emit_;
  int in_flight_ = 0;
  bool stop_;
};

}  // namespace

extern "C" {

void* dl_open(const char** paths, int n_paths, int n_threads, int capacity) {
  std::vector<std::string> p(paths, paths + n_paths);
  return new Loader(std::move(p), n_threads > 0 ? n_threads : 4,
                    capacity > 0 ? capacity : 8);
}

// Pops the next frame into out (size out_capacity floats). Returns the
// number of floats written (h*w), 0 at end of sequence, -1 if the buffer is
// too small (then *h / *w carry the required shape).
int dl_next(void* handle, float* out, int out_capacity, int* h, int* w) {
  Frame f;
  if (!static_cast<Loader*>(handle)->Next(&f)) return 0;
  *h = f.height;
  *w = f.width;
  int n = f.height * f.width;
  if (n > out_capacity) return -1;
  memcpy(out, f.gray.data(), sizeof(float) * n);
  return n;
}

int dl_size(void* handle) { return static_cast<Loader*>(handle)->size(); }

void dl_close(void* handle) { delete static_cast<Loader*>(handle); }

// Synchronous single-file decode (random access).
int dl_decode(const char* path, float* out, int out_capacity, int* h, int* w) {
  Frame f;
  if (!Decode(path, &f)) return 0;
  *h = f.height;
  *w = f.width;
  int n = f.height * f.width;
  if (n > out_capacity) return -1;
  memcpy(out, f.gray.data(), sizeof(float) * n);
  return n;
}

}  // extern "C"
