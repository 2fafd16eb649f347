// Pipeline executor: N stages, each a bounded MPMC queue + worker threads.
//
// TPU-native equivalent of the reference's module spin threads + bounded
// queues (hydra PipelineQueues; ActiveWindowModule/BackendModule spin threads,
// SURVEY.md §2.7 row 1) and of its detached change-detection thread
// (khronos/src/backend/backend.cpp:189-216): each stage owns a queue of
// opaque int64 tokens and one or more worker threads that invoke a registered
// callback per token. Callbacks (Python via ctypes, which re-acquires the GIL
// per call) may push tokens to downstream stages, so conditional flows
// (change detection every n frames / on loop closure) are expressed by the
// stage code itself, exactly like the reference's spinCallback.
//
// drain() waits until every queue is empty AND no callback is in flight —
// the equivalent of the reference's stop()+join sequence at save time.

#include <atomic>
#include <chrono>
#include <condition_variable>
#include <cstdint>
#include <deque>
#include <mutex>
#include <thread>
#include <vector>

extern "C" {
typedef void (*stage_cb)(int64_t item, void* user);
}

namespace {

struct Stage {
  std::deque<int64_t> queue;
  std::mutex mu;
  std::condition_variable cv_push;  // waiters: producers blocked on capacity
  std::condition_variable cv_pop;   // waiters: workers waiting for items
  stage_cb cb = nullptr;
  void* user = nullptr;
  int64_t capacity = 0;  // 0 = unbounded
  std::atomic<int64_t> in_flight{0};   // callbacks currently executing
  std::atomic<int64_t> processed{0};
  std::atomic<int64_t> max_depth{0};
  std::vector<std::thread> workers;
  int num_workers = 1;
};

struct Executor {
  std::vector<Stage> stages;
  std::atomic<bool> stopping{false};
  std::mutex drain_mu;
  std::condition_variable drain_cv;

  explicit Executor(int n, int64_t capacity) : stages(n) {
    for (auto& s : stages) s.capacity = capacity;
  }

  bool idle() {
    for (auto& s : stages) {
      std::lock_guard<std::mutex> lk(s.mu);
      if (!s.queue.empty() || s.in_flight.load() > 0) return false;
    }
    return true;
  }

  void worker(int si) {
    Stage& s = stages[si];
    for (;;) {
      int64_t item;
      {
        std::unique_lock<std::mutex> lk(s.mu);
        s.cv_pop.wait(lk, [&] { return stopping.load() || !s.queue.empty(); });
        if (s.queue.empty()) return;  // stopping and drained
        item = s.queue.front();
        s.queue.pop_front();
        s.in_flight.fetch_add(1);
      }
      s.cv_push.notify_one();
      if (s.cb) s.cb(item, s.user);
      s.in_flight.fetch_sub(1);
      s.processed.fetch_add(1);
      drain_cv.notify_all();
    }
  }
};

}  // namespace

extern "C" {

void* exec_create(int n_stages, int64_t capacity) {
  if (n_stages <= 0) return nullptr;
  return new Executor(n_stages, capacity);
}

void exec_set_stage(void* h, int stage, stage_cb cb, void* user, int num_workers) {
  auto* e = static_cast<Executor*>(h);
  if (stage < 0 || stage >= (int)e->stages.size()) return;
  Stage& s = e->stages[stage];
  s.cb = cb;
  s.user = user;
  s.num_workers = num_workers > 0 ? num_workers : 1;
}

void exec_start(void* h) {
  auto* e = static_cast<Executor*>(h);
  e->stopping.store(false);
  for (size_t i = 0; i < e->stages.size(); ++i) {
    Stage& s = e->stages[i];
    if (!s.workers.empty()) continue;
    for (int w = 0; w < s.num_workers; ++w) {
      s.workers.emplace_back([e, i] { e->worker((int)i); });
    }
  }
}

// block=1: wait for space (backpressure, like the reference's bounded
// PipelineQueues). block=0: return 0 immediately if full.
int exec_push(void* h, int stage, int64_t item, int block) {
  auto* e = static_cast<Executor*>(h);
  if (stage < 0 || stage >= (int)e->stages.size()) return 0;
  Stage& s = e->stages[stage];
  std::unique_lock<std::mutex> lk(s.mu);
  if (s.capacity > 0) {
    if (block) {
      s.cv_push.wait(lk, [&] {
        return e->stopping.load() || (int64_t)s.queue.size() < s.capacity;
      });
      if (e->stopping.load()) return 0;
    } else if ((int64_t)s.queue.size() >= s.capacity) {
      return 0;
    }
  }
  s.queue.push_back(item);
  int64_t d = (int64_t)s.queue.size();
  int64_t prev = s.max_depth.load();
  while (d > prev && !s.max_depth.compare_exchange_weak(prev, d)) {
  }
  lk.unlock();
  s.cv_pop.notify_one();
  return 1;
}

// Wait until all queues are empty and no callback is executing. Stage state
// is not protected by drain_mu, so a notify can race the predicate check —
// re-check on a short timeout instead of trusting wakeups alone.
void exec_drain(void* h) {
  auto* e = static_cast<Executor*>(h);
  std::unique_lock<std::mutex> lk(e->drain_mu);
  while (!e->idle()) {
    e->drain_cv.wait_for(lk, std::chrono::milliseconds(5));
  }
}

void exec_stop(void* h) {
  auto* e = static_cast<Executor*>(h);
  e->stopping.store(true);
  for (auto& s : e->stages) {
    s.cv_pop.notify_all();
    s.cv_push.notify_all();
  }
  for (auto& s : e->stages) {
    for (auto& t : s.workers) {
      if (t.joinable()) t.join();
    }
    s.workers.clear();
  }
}

void exec_destroy(void* h) {
  auto* e = static_cast<Executor*>(h);
  exec_stop(h);
  delete e;
}

int64_t exec_processed(void* h, int stage) {
  auto* e = static_cast<Executor*>(h);
  if (stage < 0 || stage >= (int)e->stages.size()) return -1;
  return e->stages[stage].processed.load();
}

int64_t exec_max_depth(void* h, int stage) {
  auto* e = static_cast<Executor*>(h);
  if (stage < 0 || stage >= (int)e->stages.size()) return -1;
  return e->stages[stage].max_depth.load();
}

int64_t exec_queue_size(void* h, int stage) {
  auto* e = static_cast<Executor*>(h);
  if (stage < 0 || stage >= (int)e->stages.size()) return -1;
  Stage& s = e->stages[stage];
  std::lock_guard<std::mutex> lk(s.mu);
  return (int64_t)s.queue.size();
}

}  // extern "C"
