// Native data-loader core for tpu-valle.
//
// Replaces the reference's native host-side data path — torch DataLoader
// worker processes + libhdf5 via lhotse's NumpyHdf5Writer (ref
// /root/reference/valle/bin/tokenizer.py:193-214, datamodule.py:336-343) —
// with an mmap'd packed shard format and a C++ worker pool that gathers,
// widens (int16 -> int32) and pads utterance code arrays into static-shape
// batch buffers while the TPU computes the previous step.
//
// Shard format "VSH1" (written by valle_tpu/data/vshard.py):
//   [0:4)   magic "VSH1"
//   [4:8)   u32 num_records (little-endian)
//   [8:12)  u32 num_quantizers Q
//   [12:..) per record: u64 payload_offset, u32 num_frames T
//   payload: int16 codes, row-major (T, Q), at payload_offset from file start
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in the image).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <mutex>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct Record {
  uint64_t offset;
  uint32_t frames;
};

struct Shard {
  const uint8_t* base = nullptr;
  size_t size = 0;
  uint32_t num_q = 0;
  std::vector<Record> records;
};

struct Handle {
  std::vector<Shard> shards;
};

bool load_shard(const char* path, Shard* out) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return false;
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size < 12) {
    ::close(fd);
    return false;
  }
  void* p = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  ::close(fd);
  if (p == MAP_FAILED) return false;
  const uint8_t* base = static_cast<const uint8_t*>(p);
  if (memcmp(base, "VSH1", 4) != 0) {
    munmap(p, st.st_size);
    return false;
  }
  uint32_t n, q;
  memcpy(&n, base + 4, 4);
  memcpy(&q, base + 8, 4);
  const size_t index_bytes = 12ull + n * 12ull;
  if (st.st_size < static_cast<off_t>(index_bytes)) {
    munmap(p, st.st_size);
    return false;
  }
  out->base = base;
  out->size = st.st_size;
  out->num_q = q;
  out->records.resize(n);
  for (uint32_t i = 0; i < n; ++i) {
    const uint8_t* rec = base + 12 + i * 12ull;
    memcpy(&out->records[i].offset, rec, 8);
    memcpy(&out->records[i].frames, rec + 8, 4);
  }
  // The whole file is read sequentially many times per epoch; advise the
  // kernel to keep pages around.
  madvise(p, st.st_size, MADV_WILLNEED);
  return true;
}

// Copy one utterance (possibly truncated to max_t) into the padded batch
// slot, widening int16 -> int32. Unfilled frames stay zero.
void fill_one(const Shard& s, int64_t rec, int32_t max_t, int32_t q,
              int32_t* out_codes, int32_t* out_len) {
  const Record& r = s.records[rec];
  const int32_t t = static_cast<int32_t>(r.frames) < max_t
                        ? static_cast<int32_t>(r.frames)
                        : max_t;
  const int32_t qc = static_cast<int32_t>(s.num_q) < q
                         ? static_cast<int32_t>(s.num_q)
                         : q;
  const int16_t* src =
      reinterpret_cast<const int16_t*>(s.base + r.offset);
  for (int32_t f = 0; f < t; ++f) {
    const int16_t* row = src + static_cast<int64_t>(f) * s.num_q;
    int32_t* dst = out_codes + static_cast<int64_t>(f) * q;
    for (int32_t c = 0; c < qc; ++c) dst[c] = row[c];
  }
  *out_len = t;
}

struct Job {
  int64_t id;
  std::vector<int32_t> shard_idx;
  std::vector<int64_t> rec_idx;
  int32_t max_t;
  int32_t q;
  std::vector<int32_t> codes;  // (n, max_t, q)
  std::vector<int32_t> lens;   // (n,)
  std::atomic<int32_t> remaining{0};
  bool done = false;
};

struct Pool {
  Handle* handle;
  std::vector<std::thread> workers;
  std::mutex mu;
  std::condition_variable cv_work;
  std::condition_variable cv_done;
  // (job, item-range) work units so large batches fan out across workers
  struct Unit {
    Job* job;
    int32_t begin, end;
  };
  std::deque<Unit> queue;
  std::deque<Job*> jobs;  // completed + in-flight, FIFO by submit order
  bool stop = false;

  void worker() {
    for (;;) {
      Unit u;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_work.wait(lk, [&] { return stop || !queue.empty(); });
        if (stop && queue.empty()) return;
        u = queue.front();
        queue.pop_front();
      }
      const int64_t slot = static_cast<int64_t>(u.job->max_t) * u.job->q;
      for (int32_t i = u.begin; i < u.end; ++i) {
        const Shard& s = handle->shards[u.job->shard_idx[i]];
        fill_one(s, u.job->rec_idx[i], u.job->max_t, u.job->q,
                 u.job->codes.data() + i * slot, u.job->lens.data() + i);
      }
      if (u.job->remaining.fetch_sub(u.end - u.begin) == u.end - u.begin) {
        std::lock_guard<std::mutex> lk(mu);
        u.job->done = true;
        cv_done.notify_all();
      }
    }
  }
};

}  // namespace

extern "C" {

void* vl_open(const char** paths, int32_t n_shards) {
  auto* h = new Handle;
  h->shards.resize(n_shards);
  for (int32_t i = 0; i < n_shards; ++i) {
    if (!load_shard(paths[i], &h->shards[i])) {
      for (auto& s : h->shards)
        if (s.base) munmap(const_cast<uint8_t*>(s.base), s.size);
      delete h;
      return nullptr;
    }
  }
  return h;
}

void vl_close(void* hp) {
  auto* h = static_cast<Handle*>(hp);
  for (auto& s : h->shards)
    if (s.base) munmap(const_cast<uint8_t*>(s.base), s.size);
  delete h;
}

int64_t vl_num_records(void* hp, int32_t shard) {
  auto* h = static_cast<Handle*>(hp);
  return h->shards[shard].records.size();
}

int32_t vl_record_frames(void* hp, int32_t shard, int64_t rec) {
  auto* h = static_cast<Handle*>(hp);
  return h->shards[shard].records[rec].frames;
}

int32_t vl_num_quantizers(void* hp, int32_t shard) {
  auto* h = static_cast<Handle*>(hp);
  return h->shards[shard].num_q;
}

// Synchronous batched gather+pad into caller-provided buffers.
// out_codes: int32 (n, max_t, q) zero-initialized by callee; out_lens: (n,).
void vl_gather_pad(void* hp, const int32_t* shard_idx, const int64_t* rec_idx,
                   int32_t n, int32_t max_t, int32_t q, int32_t* out_codes,
                   int32_t* out_lens) {
  auto* h = static_cast<Handle*>(hp);
  const int64_t slot = static_cast<int64_t>(max_t) * q;
  memset(out_codes, 0, sizeof(int32_t) * slot * n);
  for (int32_t i = 0; i < n; ++i) {
    fill_one(h->shards[shard_idx[i]], rec_idx[i], max_t, q,
             out_codes + i * slot, out_lens + i);
  }
}

void* vl_pool_create(void* hp, int32_t n_threads) {
  auto* p = new Pool;
  p->handle = static_cast<Handle*>(hp);
  if (n_threads <= 0) n_threads = 4;
  for (int32_t i = 0; i < n_threads; ++i)
    p->workers.emplace_back([p] { p->worker(); });
  return p;
}

void vl_pool_destroy(void* pp) {
  auto* p = static_cast<Pool*>(pp);
  {
    std::lock_guard<std::mutex> lk(p->mu);
    p->stop = true;
  }
  p->cv_work.notify_all();
  for (auto& t : p->workers) t.join();
  for (auto* j : p->jobs) delete j;
  delete p;
}

// Enqueue an async gather job; returns a job id to pass to vl_pool_wait.
int64_t vl_pool_submit(void* pp, const int32_t* shard_idx,
                       const int64_t* rec_idx, int32_t n, int32_t max_t,
                       int32_t q) {
  auto* p = static_cast<Pool*>(pp);
  static std::atomic<int64_t> next_id{1};
  auto* job = new Job;
  job->id = next_id.fetch_add(1);
  job->shard_idx.assign(shard_idx, shard_idx + n);
  job->rec_idx.assign(rec_idx, rec_idx + n);
  job->max_t = max_t;
  job->q = q;
  job->codes.assign(static_cast<int64_t>(n) * max_t * q, 0);
  job->lens.assign(n, 0);
  job->remaining.store(n);
  const int32_t chunk =
      n / static_cast<int32_t>(p->workers.size()) + 1;
  {
    std::lock_guard<std::mutex> lk(p->mu);
    p->jobs.push_back(job);
    for (int32_t b = 0; b < n; b += chunk)
      p->queue.push_back({job, b, b + chunk < n ? b + chunk : n});
  }
  p->cv_work.notify_all();
  return job->id;
}

// Block until job `id` completes, copy results out, release the job.
// Returns 0 on success, -1 if the id is unknown.
int32_t vl_pool_wait(void* pp, int64_t id, int32_t* out_codes,
                     int32_t* out_lens) {
  auto* p = static_cast<Pool*>(pp);
  Job* job = nullptr;
  {
    std::unique_lock<std::mutex> lk(p->mu);
    for (auto it = p->jobs.begin(); it != p->jobs.end(); ++it) {
      if ((*it)->id == id) {
        job = *it;
        p->cv_done.wait(lk, [&] { return job->done; });
        p->jobs.erase(it);
        break;
      }
    }
  }
  if (!job) return -1;
  memcpy(out_codes, job->codes.data(), job->codes.size() * sizeof(int32_t));
  memcpy(out_lens, job->lens.data(), job->lens.size() * sizeof(int32_t));
  delete job;
  return 0;
}

}  // extern "C"
