// fancyrec_io: native row-gather engine for BigFile feature stores.
//
// The hot IO pattern of the framework is "gather K scattered float32 rows
// from a (N x D) feature.bin into one contiguous batch buffer" (the
// reference did this as one seek+read syscall pair per row,
// util/imgbigfile.py:19-53). This library memory-maps the file once and
// gathers rows with a small thread pool, with madvise(WILLNEED) prefetch
// hints for the requested pages.
//
// C ABI (consumed from Python via ctypes, no pybind11 dependency):
//   frio_open(path, rows, dim)          -> handle (>=0) or -errno
//   frio_gather(handle, idx, n, out)    -> 0 or -1; out: n*dim float32
//   frio_prefetch(handle, idx, n)       -> advise kernel about coming rows
//   frio_close(handle)
//
// Build: make -C native  (produces libfancyrec_io.so)

#include <atomic>
#include <cerrno>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct Store {
  const float* base = nullptr;
  size_t bytes = 0;
  int64_t rows = 0;
  int64_t dim = 0;
  int fd = -1;
  bool open = false;
};

std::mutex g_mu;
std::vector<Store> g_stores;
long g_page = sysconf(_SC_PAGESIZE);

int hw_threads() {
  unsigned n = std::thread::hardware_concurrency();
  return n ? static_cast<int>(n) : 1;
}

}  // namespace

extern "C" {

int64_t frio_open(const char* path, int64_t rows, int64_t dim) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return -errno;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    int e = errno;
    ::close(fd);
    return -e;
  }
  size_t need = static_cast<size_t>(rows) * dim * sizeof(float);
  if (static_cast<size_t>(st.st_size) < need) {
    ::close(fd);
    return -EINVAL;
  }
  void* p = mmap(nullptr, need, PROT_READ, MAP_SHARED, fd, 0);
  if (p == MAP_FAILED) {
    int e = errno;
    ::close(fd);
    return -e;
  }
  madvise(p, need, MADV_RANDOM);
  Store s;
  s.base = static_cast<const float*>(p);
  s.bytes = need;
  s.rows = rows;
  s.dim = dim;
  s.fd = fd;
  s.open = true;
  std::lock_guard<std::mutex> lk(g_mu);
  for (size_t i = 0; i < g_stores.size(); ++i) {
    if (!g_stores[i].open) {
      g_stores[i] = s;
      return static_cast<int64_t>(i);
    }
  }
  g_stores.push_back(s);
  return static_cast<int64_t>(g_stores.size() - 1);
}

int frio_prefetch(int64_t handle, const int64_t* idx, int64_t n) {
  std::lock_guard<std::mutex> lk(g_mu);
  if (handle < 0 || handle >= static_cast<int64_t>(g_stores.size())) return -1;
  Store s = g_stores[handle];
  if (!s.open) return -1;
  size_t row_bytes = s.dim * sizeof(float);
  for (int64_t i = 0; i < n; ++i) {
    if (idx[i] < 0 || idx[i] >= s.rows) continue;
    const char* p = reinterpret_cast<const char*>(s.base) + idx[i] * row_bytes;
    const char* aligned =
        reinterpret_cast<const char*>(
            reinterpret_cast<uintptr_t>(p) & ~(g_page - 1));
    size_t len = row_bytes + (p - aligned);
    madvise(const_cast<char*>(aligned), len, MADV_WILLNEED);
  }
  return 0;
}

int frio_gather(int64_t handle, const int64_t* idx, int64_t n, float* out) {
  Store s;
  {
    std::lock_guard<std::mutex> lk(g_mu);
    if (handle < 0 || handle >= static_cast<int64_t>(g_stores.size())) return -1;
    s = g_stores[handle];
  }
  if (!s.open) return -1;
  for (int64_t i = 0; i < n; ++i) {
    if (idx[i] < 0 || idx[i] >= s.rows) return -1;
  }
  size_t row_bytes = s.dim * sizeof(float);
  int workers = hw_threads();
  if (workers > 8) workers = 8;
  if (n < 64 || workers <= 1) {
    for (int64_t i = 0; i < n; ++i) {
      memcpy(out + i * s.dim, s.base + idx[i] * s.dim, row_bytes);
    }
    return 0;
  }
  std::atomic<int64_t> next(0);
  auto work = [&]() {
    for (;;) {
      int64_t i = next.fetch_add(16);
      if (i >= n) break;
      int64_t end = i + 16 < n ? i + 16 : n;
      for (; i < end; ++i) {
        memcpy(out + i * s.dim, s.base + idx[i] * s.dim, row_bytes);
      }
    }
  };
  std::vector<std::thread> pool;
  for (int t = 0; t < workers - 1; ++t) pool.emplace_back(work);
  work();
  for (auto& t : pool) t.join();
  return 0;
}

int frio_close(int64_t handle) {
  std::lock_guard<std::mutex> lk(g_mu);
  if (handle < 0 || handle >= static_cast<int64_t>(g_stores.size())) return -1;
  Store& s = g_stores[handle];
  if (!s.open) return -1;
  munmap(const_cast<float*>(s.base), s.bytes);
  ::close(s.fd);
  s.open = false;
  return 0;
}

}  // extern "C"
