// vsl: native prefetching file reader for the training input pipeline.
//
// Runtime role (reference parity): the reference trains through torch
// DataLoader worker processes (training/datasets/open_sora/dataloader.py)
// whose IO+decode runs in torch's native code, off the interpreter. Under
// single-process SPMD there are no worker processes, so sample IO would
// otherwise serialize on the Python thread between device steps. This
// library restores the native, GIL-free IO path: a pthread pool services
// positioned reads (pread) straight into caller-owned numpy buffers, so the
// host assembles the next micro-batch while the chip runs the current step.
//
// Plain C ABI (ctypes-friendly; no pybind11 in the image):
//   void* vsl_create(int threads);
//   long  vsl_submit(void* pool, const char* path, long offset,
//                    long nbytes, void* dst);   // -> job id, -1 on alloc fail
//   int   vsl_wait(void* pool, long job);       // 0 ok, -errno on IO error,
//                                               // -EINVAL unknown job
//   long  vsl_inflight(void* pool);             // queued + running jobs
//   void  vsl_destroy(void* pool);
//
// Build: g++ -O3 -shared -fPIC -pthread (videosys_tpu/native/__init__.py
// compiles on first import and caches the .so next to this file).

#include <cerrno>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <fcntl.h>
#include <mutex>
#include <string>
#include <thread>
#include <unistd.h>
#include <unordered_map>
#include <vector>

namespace {

struct Job {
  std::string path;
  int64_t offset;
  int64_t nbytes;
  void* dst;
  int status = 1;  // 1 = pending/running, 0 = ok, <0 = -errno
};

struct Pool {
  std::mutex mu;
  std::condition_variable cv_work;   // signals workers: queue non-empty/stop
  std::condition_variable cv_done;   // signals waiters: some job finished
  std::deque<int64_t> queue;
  std::unordered_map<int64_t, Job> jobs;
  std::vector<std::thread> workers;
  int64_t next_id = 0;
  int64_t inflight = 0;
  bool stopping = false;

  explicit Pool(int threads) {
    for (int i = 0; i < threads; ++i) {
      workers.emplace_back([this] { this->worker(); });
    }
  }

  ~Pool() {
    {
      std::lock_guard<std::mutex> lk(mu);
      stopping = true;
    }
    cv_work.notify_all();
    for (auto& t : workers) t.join();
  }

  static int read_file(const Job& j) {
    int fd = ::open(j.path.c_str(), O_RDONLY);
    if (fd < 0) return -errno;
    char* out = static_cast<char*>(j.dst);
    int64_t done = 0;
    int rc = 0;
    while (done < j.nbytes) {
      ssize_t n = ::pread(fd, out + done, static_cast<size_t>(j.nbytes - done),
                          static_cast<off_t>(j.offset + done));
      if (n < 0) {
        if (errno == EINTR) continue;
        rc = -errno;
        break;
      }
      if (n == 0) {  // short file
        rc = -EIO;
        break;
      }
      done += n;
    }
    ::close(fd);
    return rc;
  }

  void worker() {
    std::unique_lock<std::mutex> lk(mu);
    for (;;) {
      cv_work.wait(lk, [this] { return stopping || !queue.empty(); });
      if (stopping && queue.empty()) return;
      int64_t id = queue.front();
      queue.pop_front();
      Job job = jobs[id];  // copy path/ptrs; dst stays caller-owned
      lk.unlock();
      int rc = read_file(job);
      lk.lock();
      auto it = jobs.find(id);
      if (it != jobs.end()) it->second.status = rc;
      --inflight;
      cv_done.notify_all();
    }
  }
};

}  // namespace

extern "C" {

void* vsl_create(int threads) {
  if (threads < 1) threads = 1;
  return new (std::nothrow) Pool(threads);
}

long vsl_submit(void* pool, const char* path, long offset, long nbytes,
                void* dst) {
  auto* p = static_cast<Pool*>(pool);
  if (!p || !path || !dst || nbytes < 0) return -1;
  std::lock_guard<std::mutex> lk(p->mu);
  int64_t id = p->next_id++;
  Job& j = p->jobs[id];
  j.path = path;
  j.offset = offset;
  j.nbytes = nbytes;
  j.dst = dst;
  p->queue.push_back(id);
  ++p->inflight;
  p->cv_work.notify_one();
  return static_cast<long>(id);
}

int vsl_wait(void* pool, long job) {
  auto* p = static_cast<Pool*>(pool);
  if (!p) return -EINVAL;
  std::unique_lock<std::mutex> lk(p->mu);
  if (p->jobs.find(job) == p->jobs.end()) return -EINVAL;
  p->cv_done.wait(lk, [&] {
    auto it = p->jobs.find(job);
    return it == p->jobs.end() || it->second.status != 1;
  });
  auto it = p->jobs.find(job);
  if (it == p->jobs.end()) return -EINVAL;  // double wait on the same id
  int rc = it->second.status;
  p->jobs.erase(it);  // one wait per job; result consumed
  return rc;
}

long vsl_inflight(void* pool) {
  auto* p = static_cast<Pool*>(pool);
  if (!p) return 0;
  std::lock_guard<std::mutex> lk(p->mu);
  return static_cast<long>(p->inflight);
}

void vsl_destroy(void* pool) { delete static_cast<Pool*>(pool); }

}  // extern "C"
