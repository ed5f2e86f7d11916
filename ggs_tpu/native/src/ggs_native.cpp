// ggs_native: C++ host runtime for ggs_tpu.
//
// The TPU compute path is JAX/Pallas; this library covers the host-side
// runtime around it, where the reference leans on PIL/matplotlib in the hot
// loop (modules/utils.py:62-69 writes the best-individual PNG synchronously
// from the training loop). Provided here:
//
//   * a dependency-free PNG encoder (RGB8, zlib deflate) — no PIL needed
//   * an asynchronous frame-writer: a background worker thread with a
//     bounded queue, so snapshot PNG encoding/IO never blocks the
//     generation loop
//   * CSV appending for metrics streams
//
// Exposed with a plain C ABI for ctypes (no pybind11 in this image).
//
// Build: make -C ggs_tpu/native  (g++ -O2 -shared -fPIC, links -lz -lpthread)

#include <zlib.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------- PNG

void put_u32be(std::vector<uint8_t>& out, uint32_t v) {
  out.push_back((v >> 24) & 0xff);
  out.push_back((v >> 16) & 0xff);
  out.push_back((v >> 8) & 0xff);
  out.push_back(v & 0xff);
}

void put_chunk(std::vector<uint8_t>& out, const char type[4],
               const uint8_t* data, size_t len) {
  put_u32be(out, static_cast<uint32_t>(len));
  size_t start = out.size();
  out.insert(out.end(), type, type + 4);
  if (len) out.insert(out.end(), data, data + len);
  uint32_t crc = crc32(0L, out.data() + start, static_cast<uInt>(len + 4));
  put_u32be(out, crc);
}

// Deflate H x W x 3 RGB8 as PNG scanlines (filter 0 per row).
bool deflate_scanlines_rgb8(const uint8_t* rgb, int h, int w,
                            std::vector<uint8_t>& z) {
  if (h <= 0 || w <= 0) return false;
  const size_t stride = static_cast<size_t>(w) * 3;
  std::vector<uint8_t> raw((stride + 1) * h);
  for (int y = 0; y < h; ++y) {
    raw[y * (stride + 1)] = 0;
    std::memcpy(&raw[y * (stride + 1) + 1], rgb + y * stride, stride);
  }
  uLongf bound = compressBound(static_cast<uLong>(raw.size()));
  z.resize(bound);
  if (compress2(z.data(), &bound, raw.data(), static_cast<uLong>(raw.size()),
                6) != Z_OK) {
    return false;
  }
  z.resize(bound);
  return true;
}

void put_ihdr(std::vector<uint8_t>& out, int h, int w) {
  uint8_t ihdr[13];
  ihdr[0] = (w >> 24) & 0xff; ihdr[1] = (w >> 16) & 0xff;
  ihdr[2] = (w >> 8) & 0xff;  ihdr[3] = w & 0xff;
  ihdr[4] = (h >> 24) & 0xff; ihdr[5] = (h >> 16) & 0xff;
  ihdr[6] = (h >> 8) & 0xff;  ihdr[7] = h & 0xff;
  ihdr[8] = 8;   // bit depth
  ihdr[9] = 2;   // color type: truecolor RGB
  ihdr[10] = 0;  // compression
  ihdr[11] = 0;  // filter
  ihdr[12] = 0;  // interlace
  put_chunk(out, "IHDR", ihdr, sizeof(ihdr));
}

const uint8_t kPngSig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};

// Encode H x W x 3 RGB8 (row-major, tightly packed) into a PNG byte stream.
bool encode_png_rgb8(const uint8_t* rgb, int h, int w,
                     std::vector<uint8_t>& out) {
  std::vector<uint8_t> z;
  if (!deflate_scanlines_rgb8(rgb, h, w, z)) return false;

  out.clear();
  out.insert(out.end(), kPngSig, kPngSig + 8);
  put_ihdr(out, h, w);
  put_chunk(out, "IDAT", z.data(), z.size());
  put_chunk(out, "IEND", nullptr, 0);
  return true;
}

bool write_file(const std::string& path, const std::vector<uint8_t>& bytes);

// ---------------------------------------------------------------- APNG
//
// Streaming animated-PNG builder: the reference's config gestures at video
// output (SAVE_VIDEO/FPS/VIDEO_LEN, modules/config.py:61-64) but only ever
// writes loose frames, leaving assembly to the user. Here frames stream in
// as raw RGB8, are deflated immediately (so memory holds compressed frames
// only), and finish() writes a spec-compliant APNG: acTL + per-frame
// fcTL/fdAT with full-frame replace semantics, looping forever.
class ApngBuilder {
 public:
  ApngBuilder(std::string path, int h, int w, int fps)
      : path_(std::move(path)), h_(h), w_(w),
        fps_(fps > 0 ? fps : 30), failed_(false) {}

  bool add(const uint8_t* rgb) {
    std::vector<uint8_t> z;
    if (!deflate_scanlines_rgb8(rgb, h_, w_, z)) {
      failed_ = true;
      return false;
    }
    frames_.push_back(std::move(z));
    return true;
  }

  bool finish() {
    if (failed_ || frames_.empty()) return false;
    std::vector<uint8_t> out;
    out.insert(out.end(), kPngSig, kPngSig + 8);
    put_ihdr(out, h_, w_);

    uint8_t actl[8];
    uint32_t nf = static_cast<uint32_t>(frames_.size());
    actl[0] = (nf >> 24) & 0xff; actl[1] = (nf >> 16) & 0xff;
    actl[2] = (nf >> 8) & 0xff;  actl[3] = nf & 0xff;
    actl[4] = actl[5] = actl[6] = actl[7] = 0;  // num_plays 0 = loop forever
    put_chunk(out, "acTL", actl, sizeof(actl));

    uint32_t seq = 0;
    for (size_t i = 0; i < frames_.size(); ++i) {
      uint8_t fctl[26];
      std::memset(fctl, 0, sizeof(fctl));
      uint32_t s = seq++;
      fctl[0] = (s >> 24) & 0xff; fctl[1] = (s >> 16) & 0xff;
      fctl[2] = (s >> 8) & 0xff;  fctl[3] = s & 0xff;
      fctl[4] = (w_ >> 24) & 0xff; fctl[5] = (w_ >> 16) & 0xff;
      fctl[6] = (w_ >> 8) & 0xff;  fctl[7] = w_ & 0xff;
      fctl[8] = (h_ >> 24) & 0xff; fctl[9] = (h_ >> 16) & 0xff;
      fctl[10] = (h_ >> 8) & 0xff; fctl[11] = h_ & 0xff;
      // x/y offsets stay 0 (full-frame updates)
      fctl[20] = 0; fctl[21] = 1;                    // delay_num = 1
      fctl[22] = (fps_ >> 8) & 0xff; fctl[23] = fps_ & 0xff;  // delay_den
      fctl[24] = 0;  // dispose: none
      fctl[25] = 0;  // blend: source (replace)
      put_chunk(out, "fcTL", fctl, sizeof(fctl));

      const std::vector<uint8_t>& z = frames_[i];
      if (i == 0) {
        put_chunk(out, "IDAT", z.data(), z.size());
      } else {
        std::vector<uint8_t> fdat(4 + z.size());
        uint32_t s2 = seq++;
        fdat[0] = (s2 >> 24) & 0xff; fdat[1] = (s2 >> 16) & 0xff;
        fdat[2] = (s2 >> 8) & 0xff;  fdat[3] = s2 & 0xff;
        std::memcpy(fdat.data() + 4, z.data(), z.size());
        put_chunk(out, "fdAT", fdat.data(), fdat.size());
      }
    }
    put_chunk(out, "IEND", nullptr, 0);
    return write_file(path_, out);
  }

  int h() const { return h_; }
  int w() const { return w_; }

 private:
  std::string path_;
  int h_, w_, fps_;
  bool failed_;
  std::vector<std::vector<uint8_t>> frames_;
};

bool write_file(const std::string& path, const std::vector<uint8_t>& bytes) {
  FILE* f = std::fopen(path.c_str(), "wb");
  if (!f) return false;
  size_t n = std::fwrite(bytes.data(), 1, bytes.size(), f);
  std::fclose(f);
  return n == bytes.size();
}

// ------------------------------------------------------ async writer

struct Job {
  std::string path;
  std::vector<uint8_t> rgb;
  int h, w;
};

class FrameWriter {
 public:
  explicit FrameWriter(size_t max_queue) : max_queue_(max_queue), stop_(false) {
    worker_ = std::thread([this] { run(); });
  }
  ~FrameWriter() {
    {
      std::unique_lock<std::mutex> lk(mu_);
      stop_ = true;
      cv_.notify_all();
    }
    worker_.join();
  }

  // Copies the buffer and returns immediately (blocks only if the queue is
  // full, which bounds memory instead of dropping frames).
  bool submit(const char* path, const uint8_t* rgb, int h, int w) {
    Job j;
    j.path = path;
    j.h = h;
    j.w = w;
    j.rgb.assign(rgb, rgb + static_cast<size_t>(h) * w * 3);
    std::unique_lock<std::mutex> lk(mu_);
    cv_space_.wait(lk, [this] { return queue_.size() < max_queue_ || stop_; });
    if (stop_) return false;
    queue_.push_back(std::move(j));
    cv_.notify_one();
    return true;
  }

  void flush() {
    std::unique_lock<std::mutex> lk(mu_);
    cv_space_.wait(lk, [this] { return queue_.empty() && !busy_; });
  }

  long errors() const { return errors_.load(); }

 private:
  void run() {
    for (;;) {
      Job j;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return !queue_.empty() || stop_; });
        if (queue_.empty()) {
          if (stop_) return;
          continue;
        }
        j = std::move(queue_.front());
        queue_.pop_front();
        busy_ = true;
      }
      std::vector<uint8_t> png;
      bool ok = encode_png_rgb8(j.rgb.data(), j.h, j.w, png) &&
                write_file(j.path, png);
      if (!ok) errors_.fetch_add(1);
      {
        std::unique_lock<std::mutex> lk(mu_);
        busy_ = false;
        cv_space_.notify_all();
      }
    }
  }

  size_t max_queue_;
  bool stop_;
  bool busy_ = false;
  std::deque<Job> queue_;
  std::mutex mu_;
  std::condition_variable cv_, cv_space_;
  std::thread worker_;
  std::atomic<long> errors_{0};
};

}  // namespace

extern "C" {

// Synchronous PNG write. Returns 0 on success.
int ggs_write_png_rgb8(const char* path, const uint8_t* rgb, int h, int w) {
  std::vector<uint8_t> png;
  if (!encode_png_rgb8(rgb, h, w, png)) return 1;
  return write_file(path, png) ? 0 : 2;
}

// Async frame writer lifecycle.
void* ggs_frame_writer_new(int max_queue) {
  return new FrameWriter(max_queue > 0 ? static_cast<size_t>(max_queue) : 8);
}
int ggs_frame_writer_submit(void* fw, const char* path, const uint8_t* rgb,
                            int h, int w) {
  return static_cast<FrameWriter*>(fw)->submit(path, rgb, h, w) ? 0 : 1;
}
void ggs_frame_writer_flush(void* fw) {
  static_cast<FrameWriter*>(fw)->flush();
}
long ggs_frame_writer_errors(void* fw) {
  return static_cast<FrameWriter*>(fw)->errors();
}
void ggs_frame_writer_free(void* fw) { delete static_cast<FrameWriter*>(fw); }

// APNG builder lifecycle. add() deflates immediately; finish() writes the
// file and reports success; free() releases the builder.
void* ggs_apng_new(const char* path, int h, int w, int fps) {
  if (h <= 0 || w <= 0) return nullptr;
  return new ApngBuilder(path, h, w, fps);
}
int ggs_apng_add(void* a, const uint8_t* rgb) {
  return static_cast<ApngBuilder*>(a)->add(rgb) ? 0 : 1;
}
int ggs_apng_finish(void* a) {
  return static_cast<ApngBuilder*>(a)->finish() ? 0 : 1;
}
void ggs_apng_free(void* a) { delete static_cast<ApngBuilder*>(a); }

// Append one CSV row of doubles (creates the file with a header if absent).
int ggs_csv_append(const char* path, const char* header, const double* vals,
                   int n) {
  FILE* probe = std::fopen(path, "r");
  bool exists = probe != nullptr;
  if (probe) std::fclose(probe);
  FILE* f = std::fopen(path, "a");
  if (!f) return 1;
  if (!exists && header && header[0]) std::fprintf(f, "%s\n", header);
  for (int i = 0; i < n; ++i) {
    std::fprintf(f, i + 1 == n ? "%.10g\n" : "%.10g,", vals[i]);
  }
  std::fclose(f);
  return 0;
}

}  // extern "C"
