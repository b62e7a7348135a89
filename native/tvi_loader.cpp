// tvi native data loader — threaded shard reader + batch assembler.
//
// The reference's input pipeline is Python/PIL inside torch DataLoader
// workers (SURVEY §2.4, missing src/data.py).  This is the TPU-framework
// equivalent: training data is packed into binary shards (one uint8 video
// clip per record, fixed geometry — see tvi/data/shards.py), and this
// library serves shuffled, normalized float32 batches from a background
// thread pool with a bounded prefetch queue, so the host input pipeline
// never blocks the device step.
//
// C API (ctypes-friendly):
//   tvi_loader_open(shard_paths, n_shards, batch, frames, h, w, seed,
//                   prefetch, n_threads) -> handle
//   tvi_loader_next(handle, float* out)   // blocking; out has
//                                         // batch*frames*h*w*3 floats in [-1,1]
//   tvi_loader_close(handle)
//
// Shard format: magic "TVIS", u32 version, u32 record_count,
// u32 frames, u32 height, u32 width, then records of
// frames*h*w*3 raw uint8, frame-major.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <random>
#include <string>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct Shard {
  const uint8_t* data = nullptr;   // mmap'd file
  size_t size = 0;
  uint32_t records = 0;
  uint32_t frames = 0, height = 0, width = 0;
  size_t record_bytes = 0;
  size_t payload_offset = 0;
  int fd = -1;

  bool open(const char* path) {
    fd = ::open(path, O_RDONLY);
    if (fd < 0) return false;
    struct stat st;
    if (fstat(fd, &st) != 0) return false;
    size = static_cast<size_t>(st.st_size);
    data = static_cast<const uint8_t*>(
        mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0));
    if (data == MAP_FAILED) { data = nullptr; return false; }
    if (size < 24 || memcmp(data, "TVIS", 4) != 0) return false;
    uint32_t version;
    memcpy(&version, data + 4, 4);
    if (version != 1) return false;
    memcpy(&records, data + 8, 4);
    memcpy(&frames, data + 12, 4);
    memcpy(&height, data + 16, 4);
    memcpy(&width, data + 20, 4);
    payload_offset = 24;
    record_bytes = static_cast<size_t>(frames) * height * width * 3;
    return payload_offset + record_bytes * records <= size;
  }

  void close() {
    if (data) munmap(const_cast<uint8_t*>(data), size);
    if (fd >= 0) ::close(fd);
    data = nullptr; fd = -1;
  }

  const uint8_t* record(uint32_t i) const {
    return data + payload_offset + record_bytes * i;
  }
};

struct Loader {
  std::vector<Shard> shards;
  std::vector<std::pair<uint32_t, uint32_t>> index;  // (shard, record)
  uint32_t batch = 0, frames = 0, height = 0, width = 0;
  size_t batch_floats = 0;

  std::deque<std::vector<float>> queue;
  std::mutex mu;
  std::condition_variable cv_full, cv_empty;
  size_t prefetch = 4;
  std::atomic<bool> stop{false};
  std::vector<std::thread> workers;
  std::mt19937_64 rng;
  std::mutex rng_mu;

  void worker() {
    std::vector<float> buf;
    while (!stop.load()) {
      buf.resize(batch_floats);
      // sample records
      {
        std::vector<uint32_t> picks(batch);
        {
          std::lock_guard<std::mutex> g(rng_mu);
          for (uint32_t b = 0; b < batch; ++b)
            picks[b] = static_cast<uint32_t>(rng() % index.size());
        }
        const float scale = 2.0f / 255.0f;
        for (uint32_t b = 0; b < batch; ++b) {
          auto [si, ri] = index[picks[b]];
          const uint8_t* src = shards[si].record(ri);
          float* dst = buf.data() + static_cast<size_t>(b) *
                       frames * height * width * 3;
          const size_t n = static_cast<size_t>(frames) * height * width * 3;
          for (size_t i = 0; i < n; ++i)
            dst[i] = static_cast<float>(src[i]) * scale - 1.0f;
        }
      }
      std::unique_lock<std::mutex> lk(mu);
      cv_full.wait(lk, [&] { return queue.size() < prefetch || stop.load(); });
      if (stop.load()) return;
      queue.push_back(std::move(buf));
      buf = std::vector<float>();
      cv_empty.notify_one();
    }
  }
};

}  // namespace

extern "C" {

void* tvi_loader_open(const char** shard_paths, int n_shards, int batch,
                      int prefetch, int n_threads, uint64_t seed) {
  auto* L = new Loader();
  L->rng.seed(seed);
  for (int i = 0; i < n_shards; ++i) {
    Shard s;
    if (!s.open(shard_paths[i])) {
      fprintf(stderr, "[tvi_loader] failed to open shard %s\n", shard_paths[i]);
      s.close();
      continue;
    }
    if (!L->shards.empty() &&
        (s.frames != L->frames || s.height != L->height || s.width != L->width)) {
      fprintf(stderr, "[tvi_loader] shard geometry mismatch: %s\n", shard_paths[i]);
      s.close();
      continue;
    }
    L->frames = s.frames; L->height = s.height; L->width = s.width;
    uint32_t si = static_cast<uint32_t>(L->shards.size());
    for (uint32_t r = 0; r < s.records; ++r) L->index.emplace_back(si, r);
    L->shards.push_back(s);
  }
  if (L->index.empty()) { delete L; return nullptr; }
  L->batch = static_cast<uint32_t>(batch);
  L->batch_floats = static_cast<size_t>(batch) * L->frames * L->height *
                    L->width * 3;
  L->prefetch = static_cast<size_t>(prefetch > 0 ? prefetch : 2);
  int nt = n_threads > 0 ? n_threads : 2;
  for (int t = 0; t < nt; ++t)
    L->workers.emplace_back(&Loader::worker, L);
  return L;
}

// metadata accessors
int tvi_loader_frames(void* h) { return static_cast<Loader*>(h)->frames; }
int tvi_loader_height(void* h) { return static_cast<Loader*>(h)->height; }
int tvi_loader_width(void* h) { return static_cast<Loader*>(h)->width; }
long tvi_loader_num_records(void* h) {
  return static_cast<long>(static_cast<Loader*>(h)->index.size());
}

int tvi_loader_next(void* h, float* out) {
  auto* L = static_cast<Loader*>(h);
  std::vector<float> buf;
  {
    std::unique_lock<std::mutex> lk(L->mu);
    L->cv_empty.wait(lk, [&] { return !L->queue.empty() || L->stop.load(); });
    if (L->queue.empty()) return -1;
    buf = std::move(L->queue.front());
    L->queue.pop_front();
    L->cv_full.notify_one();
  }
  memcpy(out, buf.data(), buf.size() * sizeof(float));
  return 0;
}

void tvi_loader_close(void* h) {
  auto* L = static_cast<Loader*>(h);
  L->stop.store(true);
  L->cv_full.notify_all();
  L->cv_empty.notify_all();
  for (auto& t : L->workers) t.join();
  for (auto& s : L->shards) s.close();
  delete L;
}

}  // extern "C"
