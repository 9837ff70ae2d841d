// compv_tpu native runtime: aligned memory pool + prefetching frame loader.
//
// TPU-native analogue of the reference's C++ runtime layer:
//   * CompVMem aligned alloc / pool reuse  (base/compv_mem.cxx,
//     base/include/compv/base/compv_mem.h:36-91)
//   * capture/IO threads feeding the pipeline (camera plugins,
//     core/video/compv_core_video_reader_ffmpeg.cxx)
// The compute path stays in XLA; this library feeds it: double-buffered
// background reads of raw frame files into page-aligned host buffers that
// jax.device_put can DMA from without an extra copy.
//
// C ABI only (consumed via ctypes).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <mutex>
#include <thread>
#include <vector>

extern "C" {

// ------------------------------------------------------------ aligned pool

struct PoolBlock {
  void* ptr;
  size_t size;
  int in_use;
};

struct AlignedPool {
  std::vector<PoolBlock> blocks;
  std::mutex mu;
  size_t alignment;
  std::atomic<uint64_t> hits{0}, misses{0};
};

void* compv_pool_create(size_t alignment) {
  auto* p = new AlignedPool();
  p->alignment = alignment < 64 ? 64 : alignment;
  return p;
}

void* compv_pool_alloc(void* pool, size_t size) {
  auto* p = static_cast<AlignedPool*>(pool);
  std::lock_guard<std::mutex> lock(p->mu);
  for (auto& b : p->blocks) {
    if (!b.in_use && b.size >= size && b.size <= size * 2) {
      b.in_use = 1;
      p->hits++;
      return b.ptr;
    }
  }
  p->misses++;
  void* ptr = nullptr;
  if (posix_memalign(&ptr, p->alignment, size) != 0) return nullptr;
  p->blocks.push_back({ptr, size, 1});
  return ptr;
}

void compv_pool_release(void* pool, void* ptr) {
  auto* p = static_cast<AlignedPool*>(pool);
  std::lock_guard<std::mutex> lock(p->mu);
  for (auto& b : p->blocks) {
    if (b.ptr == ptr) {
      b.in_use = 0;
      return;
    }
  }
}

uint64_t compv_pool_stats(void* pool, int which) {
  auto* p = static_cast<AlignedPool*>(pool);
  if (which == 0) return p->hits.load();
  if (which == 1) return p->misses.load();
  std::lock_guard<std::mutex> lock(p->mu);
  if (which == 2) return p->blocks.size();
  uint64_t bytes = 0;
  for (auto& b : p->blocks) bytes += b.size;
  return bytes;
}

void compv_pool_destroy(void* pool) {
  auto* p = static_cast<AlignedPool*>(pool);
  for (auto& b : p->blocks) free(b.ptr);
  delete p;
}

// ----------------------------------------------------- prefetch frame loader

struct FrameLoader {
  FILE* f = nullptr;
  size_t frame_bytes = 0;
  long n_frames = 0;
  long next_read = 0;
  int depth = 0;
  bool loop = false;
  // ring of prefetched frames
  std::vector<uint8_t*> ring;
  std::vector<long> ring_frame;     // which frame index each slot holds (-1 empty)
  int head = 0, tail = 0, count = 0;
  std::mutex mu;
  std::condition_variable cv_can_read, cv_can_take;
  std::thread worker;
  std::atomic<bool> stop{false};
};

static void loader_worker(FrameLoader* L) {
  for (;;) {
    std::unique_lock<std::mutex> lock(L->mu);
    L->cv_can_read.wait(lock, [&] { return L->stop || L->count < L->depth; });
    if (L->stop) return;
    long frame = L->next_read;
    if (frame >= L->n_frames) {
      if (!L->loop) {
        // park until stopped
        L->cv_can_read.wait(lock, [&] { return (bool)L->stop; });
        return;
      }
      frame = 0;
      L->next_read = 0;
    }
    int slot = L->head;
    lock.unlock();
    // read outside the lock
    fseek(L->f, (long)(frame * L->frame_bytes), SEEK_SET);
    size_t got = fread(L->ring[slot], 1, L->frame_bytes, L->f);
    (void)got;
    lock.lock();
    L->ring_frame[slot] = frame;
    L->head = (L->head + 1) % L->depth;
    L->count++;
    L->next_read = frame + 1;
    lock.unlock();
    L->cv_can_take.notify_one();
  }
}

void* compv_loader_open(const char* path, size_t frame_bytes, int depth,
                        int loop) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  auto* L = new FrameLoader();
  L->f = f;
  L->frame_bytes = frame_bytes;
  L->n_frames = size / (long)frame_bytes;
  L->depth = depth < 2 ? 2 : depth;
  L->loop = loop != 0;
  L->ring.resize(L->depth);
  L->ring_frame.assign(L->depth, -1);
  for (int i = 0; i < L->depth; ++i) {
    if (posix_memalign(reinterpret_cast<void**>(&L->ring[i]), 4096,
                       frame_bytes) != 0) {
      L->ring[i] = static_cast<uint8_t*>(malloc(frame_bytes));
    }
  }
  L->worker = std::thread(loader_worker, L);
  return L;
}

long compv_loader_num_frames(void* loader) {
  return static_cast<FrameLoader*>(loader)->n_frames;
}

// Blocking: copy the next prefetched frame into dst. Returns the frame
// index, or -1 at end-of-stream (non-loop).
long compv_loader_next(void* loader, uint8_t* dst) {
  auto* L = static_cast<FrameLoader*>(loader);
  std::unique_lock<std::mutex> lock(L->mu);
  if (L->count == 0 && !L->loop && L->next_read >= L->n_frames) return -1;
  L->cv_can_take.wait(lock, [&] { return L->stop || L->count > 0; });
  if (L->stop && L->count == 0) return -1;
  int slot = L->tail;
  long frame = L->ring_frame[slot];
  lock.unlock();
  memcpy(dst, L->ring[slot], L->frame_bytes);
  lock.lock();
  L->ring_frame[slot] = -1;
  L->tail = (L->tail + 1) % L->depth;
  L->count--;
  lock.unlock();
  L->cv_can_read.notify_one();
  return frame;
}

void compv_loader_close(void* loader) {
  auto* L = static_cast<FrameLoader*>(loader);
  {
    std::lock_guard<std::mutex> lock(L->mu);
    L->stop = true;
  }
  L->cv_can_read.notify_all();
  L->cv_can_take.notify_all();
  if (L->worker.joinable()) L->worker.join();
  fclose(L->f);
  for (auto* b : L->ring) free(b);
  delete L;
}

// ------------------------------------------------------------ misc kernels

// Strided plane copy (stride-removal like the reference's CompVImage::wrap).
void compv_copy_strided(const uint8_t* src, size_t src_stride, uint8_t* dst,
                        size_t dst_stride, size_t row_bytes, size_t rows) {
  for (size_t r = 0; r < rows; ++r)
    memcpy(dst + r * dst_stride, src + r * src_stride, row_bytes);
}

}  // extern "C"
