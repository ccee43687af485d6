// dynoio: native data-loading runtime for dynosam_tpu.
//
// Plays the role of the reference's C++ dataset loaders
// (/root/reference/dynosam/src/dataprovider/DatasetLoader.cc,
// dynosam_common/src/utils/FileSystem.cc): parsing the dyno-preprocessed
// KITTI on-disk formats at native speed. The hot cases are the Middlebury
// .flo flow files (~4 MB/frame) and the whitespace text instance masks
// (~0.5 MB/frame, pathological for Python text parsing), plus a worker-pool
// prefetcher that overlaps file IO/parsing with device compute
// (DataInterfacePipeline's role).
//
// C ABI, consumed from Python via ctypes (see dynosam_tpu/native.py).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// .flo reader (Middlebury): magic float 202021.25, int32 w, int32 h, data.
// Returns 0 on success; fills out (h*w*2 floats, row-major, (u,v) per pixel).
// ---------------------------------------------------------------------------
int dynoio_read_flo(const char* path, float* out, int expected_h,
                    int expected_w) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  float magic = 0.f;
  int32_t w = 0, h = 0;
  if (std::fread(&magic, 4, 1, f) != 1 || magic != 202021.25f) {
    std::fclose(f);
    return -2;
  }
  if (std::fread(&w, 4, 1, f) != 1 || std::fread(&h, 4, 1, f) != 1) {
    std::fclose(f);
    return -3;
  }
  if (w != expected_w || h != expected_h) {
    std::fclose(f);
    return -4;
  }
  const size_t n = static_cast<size_t>(w) * h * 2;
  const size_t got = std::fread(out, 4, n, f);
  std::fclose(f);
  return got == n ? 0 : -5;
}

// ---------------------------------------------------------------------------
// Whitespace int text mask parser (FileSystem.cc loadSemanticMask format):
// h lines of w integers. Hand-rolled integer scan, ~20x numpy.loadtxt.
// ---------------------------------------------------------------------------
int dynoio_read_txt_mask(const char* path, int32_t* out, int h, int w) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  const long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<char> buf(static_cast<size_t>(size) + 1);
  if (std::fread(buf.data(), 1, size, f) != static_cast<size_t>(size)) {
    std::fclose(f);
    return -2;
  }
  std::fclose(f);
  buf[size] = '\0';

  const char* p = buf.data();
  const char* end = p + size;
  const size_t need = static_cast<size_t>(h) * w;
  size_t count = 0;
  while (p < end && count < need) {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' || *p == '\r'))
      ++p;
    if (p >= end) break;
    bool neg = false;
    if (*p == '-') {
      neg = true;
      ++p;
    }
    int32_t v = 0;
    while (p < end && *p >= '0' && *p <= '9') {
      v = v * 10 + (*p - '0');
      ++p;
    }
    out[count++] = neg ? -v : v;
  }
  return count == need ? 0 : -3;
}

// ---------------------------------------------------------------------------
// uint16 PGM-free raw disparity decode is handled by OpenCV upstream; here we
// additionally provide the disparity->metric-depth conversion for uint16
// buffers (KittiDataProvider.hpp:490-513 semantics) to avoid a float64 pass
// through numpy.
// ---------------------------------------------------------------------------
void dynoio_disparity_to_depth(const uint16_t* raw, float* out, int n,
                               float base_line, float scale_factor) {
  for (int i = 0; i < n; ++i) {
    const uint16_t r = raw[i];
    out[i] = r > 0 ? base_line / (static_cast<float>(r) / scale_factor) : 0.f;
  }
}

// ---------------------------------------------------------------------------
// Prefetcher: a worker pool that loads (flo, mask) pairs ahead of the
// consumer. Jobs are keyed by frame index; results are buffered until
// collected. (The DataInterfacePipeline / ThreadsafeQueue role.)
// ---------------------------------------------------------------------------
namespace {

struct Job {
  int frame;
  std::string flo_path;    // may be empty
  std::string mask_path;   // may be empty
  int h, w;
};

struct Result {
  int frame;
  int status;
  std::vector<float> flow;
  std::vector<int32_t> mask;
};

struct Prefetcher {
  std::vector<std::thread> workers;
  std::queue<Job> jobs;
  std::vector<Result> done;
  std::mutex mu;
  std::condition_variable cv_jobs, cv_done;
  bool shutdown = false;

  explicit Prefetcher(int n_workers) {
    for (int i = 0; i < n_workers; ++i)
      workers.emplace_back([this] { run(); });
  }

  ~Prefetcher() {
    {
      std::lock_guard<std::mutex> lk(mu);
      shutdown = true;
    }
    cv_jobs.notify_all();
    for (auto& t : workers) t.join();
  }

  void run() {
    for (;;) {
      Job job;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_jobs.wait(lk, [this] { return shutdown || !jobs.empty(); });
        if (shutdown && jobs.empty()) return;
        job = jobs.front();
        jobs.pop();
      }
      Result res;
      res.frame = job.frame;
      res.status = 0;
      if (!job.flo_path.empty()) {
        res.flow.resize(static_cast<size_t>(job.h) * job.w * 2);
        int rc = dynoio_read_flo(job.flo_path.c_str(), res.flow.data(), job.h,
                                 job.w);
        if (rc != 0) res.status = rc;
      }
      if (!job.mask_path.empty()) {
        res.mask.resize(static_cast<size_t>(job.h) * job.w);
        int rc = dynoio_read_txt_mask(job.mask_path.c_str(), res.mask.data(),
                                      job.h, job.w);
        if (rc != 0) res.status = rc;
      }
      {
        std::lock_guard<std::mutex> lk(mu);
        done.push_back(std::move(res));
      }
      cv_done.notify_all();
    }
  }
};

}  // namespace

void* dynoio_prefetcher_create(int n_workers) {
  return new Prefetcher(n_workers > 0 ? n_workers : 2);
}

void dynoio_prefetcher_destroy(void* p) {
  delete static_cast<Prefetcher*>(p);
}

void dynoio_prefetcher_submit(void* p, int frame, const char* flo_path,
                              const char* mask_path, int h, int w) {
  auto* pf = static_cast<Prefetcher*>(p);
  {
    std::lock_guard<std::mutex> lk(pf->mu);
    pf->jobs.push(Job{frame, flo_path ? flo_path : "",
                      mask_path ? mask_path : "", h, w});
  }
  pf->cv_jobs.notify_one();
}

// Blocks until `frame` is ready; copies into the buffers (either may be
// null). Returns the job status (0 = ok).
int dynoio_prefetcher_collect(void* p, int frame, float* flow_out,
                              int32_t* mask_out) {
  auto* pf = static_cast<Prefetcher*>(p);
  std::unique_lock<std::mutex> lk(pf->mu);
  for (;;) {
    for (size_t i = 0; i < pf->done.size(); ++i) {
      if (pf->done[i].frame == frame) {
        Result res = std::move(pf->done[i]);
        pf->done.erase(pf->done.begin() + i);
        lk.unlock();
        if (flow_out && !res.flow.empty())
          std::memcpy(flow_out, res.flow.data(), res.flow.size() * 4);
        if (mask_out && !res.mask.empty())
          std::memcpy(mask_out, res.mask.data(), res.mask.size() * 4);
        return res.status;
      }
    }
    pf->cv_done.wait(lk);
  }
}

}  // extern "C"
