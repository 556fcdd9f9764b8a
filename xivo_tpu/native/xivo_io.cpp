// Native IO runtime for xivo_tpu.
//
// The host-side analogue of the reference's C++ runtime pieces: the ASL
// csv DataLoader (src/loader.cpp), image decode (cv::imread for
// grayscale PGM/raw), and the EstimatorProcess SPSC prefetch queue
// (common/ProducerConsumerQueue.h, folly-style lock-free ring). The
// device filter consumes frames at >800 fps; Python-side decode/parse
// becomes the bottleneck for dataset replay, so these run natively with
// a background prefetch thread double-buffering ahead of the consumer.
//
// Exposed via a plain C ABI and loaded with ctypes (no pybind11 in this
// toolchain — see io/native.py).

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------
// CSV parsing: "ts,gx,gy,gz,ax,ay,az" or "ts,filename" lines, '#'
// comments ignored. Returns the number of rows parsed; values written
// into out (n_cols doubles per row, timestamps in seconds).
// ---------------------------------------------------------------------
int xivo_parse_imu_csv(const char* path, double* out, int max_rows) {
  std::ifstream is(path);
  if (!is) return -1;
  std::string line;
  int n = 0;
  while (std::getline(is, line) && n < max_rows) {
    if (line.empty() || line[0] == '#') continue;
    const char* p = line.c_str();
    char* end = nullptr;
    long long ts = strtoll(p, &end, 10);
    if (end == p) continue;
    double* row = out + n * 7;
    row[0] = static_cast<double>(ts) * 1e-9;
    bool ok = true;
    for (int i = 0; i < 6; ++i) {
      while (*end == ',' || *end == ' ') ++end;
      const char* q = end;
      row[1 + i] = strtod(q, &end);
      if (end == q) { ok = false; break; }
    }
    if (ok) ++n;
  }
  return n;
}

// ---------------------------------------------------------------------
// PGM (P5, 8/16-bit) decode into a float32 buffer. Returns 0 on
// success; fills w/h. Caller provides a buffer of max_pixels floats.
// ---------------------------------------------------------------------
static int skip_ws_comments(std::ifstream& is) {
  int c;
  while ((c = is.peek()) != EOF) {
    if (c == '#') {
      std::string dummy;
      std::getline(is, dummy);
    } else if (isspace(c)) {
      is.get();
    } else {
      break;
    }
  }
  return 0;
}

int xivo_load_pgm(const char* path, float* out, int max_pixels, int* w,
                  int* h) {
  std::ifstream is(path, std::ios::binary);
  if (!is) return -1;
  std::string magic;
  is >> magic;
  if (magic != "P5") return -2;
  skip_ws_comments(is);
  int width, height, maxv;
  is >> width;
  skip_ws_comments(is);
  is >> height;
  skip_ws_comments(is);
  is >> maxv;
  is.get();  // single whitespace after header
  if (width * height > max_pixels) return -3;
  const size_t npix = static_cast<size_t>(width) * height;
  if (maxv < 256) {
    std::vector<uint8_t> buf(npix);
    is.read(reinterpret_cast<char*>(buf.data()), npix);
    for (size_t i = 0; i < npix; ++i) out[i] = buf[i];
  } else {
    std::vector<uint8_t> buf(npix * 2);
    is.read(reinterpret_cast<char*>(buf.data()), npix * 2);
    for (size_t i = 0; i < npix; ++i)
      out[i] = static_cast<float>((buf[2 * i] << 8) | buf[2 * i + 1]);
  }
  *w = width;
  *h = height;
  return 0;
}

// ---------------------------------------------------------------------
// SPSC image prefetcher: a background thread decodes a list of PGM
// paths ahead of the consumer through a lock-free ring (the
// ProducerConsumerQueue pattern, common/ProducerConsumerQueue.h:80-180:
// single producer, single consumer, acquire/release on head/tail).
// ---------------------------------------------------------------------
struct Slot {
  std::vector<float> px;
  int w = 0, h = 0, status = -1;
};

struct Prefetcher {
  std::vector<std::string> paths;
  std::vector<Slot> ring;
  std::atomic<uint64_t> head{0};  // next to produce
  std::atomic<uint64_t> tail{0};  // next to consume
  std::thread worker;
  std::atomic<bool> stop{false};
  int capacity = 0;
  int max_pixels = 0;

  void run() {
    for (size_t i = 0; i < paths.size() && !stop.load(); ++i) {
      // wait for a free slot
      while (head.load(std::memory_order_relaxed) -
                 tail.load(std::memory_order_acquire) >=
             static_cast<uint64_t>(capacity)) {
        if (stop.load()) return;
        std::this_thread::yield();
      }
      Slot& s = ring[head.load(std::memory_order_relaxed) % capacity];
      s.px.resize(max_pixels);
      s.status =
          xivo_load_pgm(paths[i].c_str(), s.px.data(), max_pixels, &s.w,
                        &s.h);
      head.store(head.load(std::memory_order_relaxed) + 1,
                 std::memory_order_release);
    }
  }
};

void* xivo_prefetcher_create(const char** paths, int n_paths,
                             int capacity, int max_pixels) {
  auto* p = new Prefetcher();
  p->paths.assign(paths, paths + n_paths);
  p->ring.resize(capacity);
  p->capacity = capacity;
  p->max_pixels = max_pixels;
  p->worker = std::thread([p] { p->run(); });
  return p;
}

// Blocking pop: copies the next decoded frame into out. Returns status
// (0 ok, <0 decode error, -100 = exhausted).
int xivo_prefetcher_next(void* handle, float* out, int* w, int* h) {
  auto* p = static_cast<Prefetcher*>(handle);
  uint64_t t = p->tail.load(std::memory_order_relaxed);
  if (t >= p->paths.size()) return -100;
  while (p->head.load(std::memory_order_acquire) <= t) {
    std::this_thread::yield();
  }
  Slot& s = p->ring[t % p->capacity];
  int status = s.status;
  if (status == 0) {
    std::memcpy(out, s.px.data(),
                sizeof(float) * static_cast<size_t>(s.w) * s.h);
    *w = s.w;
    *h = s.h;
  }
  p->tail.store(t + 1, std::memory_order_release);
  return status;
}

void xivo_prefetcher_destroy(void* handle) {
  auto* p = static_cast<Prefetcher*>(handle);
  p->stop.store(true);
  if (p->worker.joinable()) p->worker.join();
  delete p;
}

}  // extern "C"
