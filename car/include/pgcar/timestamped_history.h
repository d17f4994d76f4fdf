// Realtime pub/sub core: timestamped values in a fixed-size ring with
// condition-variable change notification.
//
// Mirrors the reference's TimestampedHistory semantics
// (include/car/timestamped_history.hpp:30-155): update/get_latest/
// wait_get_next(prev_timestamp, timeout) plus the fixed-period loop helper.
#ifndef PGCAR_TIMESTAMPED_HISTORY_H_
#define PGCAR_TIMESTAMPED_HISTORY_H_

#include <sys/time.h>

#include <chrono>
#include <condition_variable>
#include <mutex>
#include <vector>

namespace pgcar {

template <typename T> class Timestamped {
 public:
  Timestamped() : timestamp_{0, 0} {}
  Timestamped(const T &data, const timeval &timestamp)
      : data_(data), timestamp_(timestamp) {}

  const T &data() const { return data_; }
  const timeval &timestamp() const { return timestamp_; }

 private:
  T data_;
  timeval timestamp_;
};

template <typename T> class TimestampedHistory {
 public:
  explicit TimestampedHistory(size_t capacity)
      : capacity_(capacity), ring_(capacity), latest_(capacity - 1) {}

  void update(const T &value, const timeval &timestamp) {
    std::unique_lock<std::mutex> lock(mutex_);
    if (valid_count_ < capacity_) ++valid_count_;
    latest_ = (latest_ + 1) % capacity_;
    ring_[latest_] = Timestamped<T>(value, timestamp);
    changed_.notify_all();
  }

  void update_now(const T &value) {
    timeval now;
    gettimeofday(&now, nullptr);
    update(value, now);
  }

  // Oldest-to-newest copy of the ring (slots never written are
  // default-constructed, like the reference).
  std::vector<Timestamped<T>> history() const {
    std::vector<Timestamped<T>> out(capacity_);
    std::unique_lock<std::mutex> lock(mutex_);
    for (size_t i = 0; i < capacity_; ++i)
      out[i] = ring_[(latest_ + 1 + i) % capacity_];
    return out;
  }

  bool get_latest(Timestamped<T> *out) const {
    std::unique_lock<std::mutex> lock(mutex_);
    if (valid_count_ == 0) return false;
    *out = ring_[latest_];
    return true;
  }

  // Blocks until a value with a timestamp different from prev_timestamp is
  // available (or the timeout elapses; timeout == nullptr waits forever).
  bool wait_get_next(const timeval &prev_timestamp, const timeval *timeout,
                     Timestamped<T> *out) const {
    if (out == nullptr) return false;
    std::unique_lock<std::mutex> lock(mutex_);
    auto fresh = [this, &prev_timestamp]() {
      if (valid_count_ == 0) return false;
      const timeval &latest_ts = ring_[latest_].timestamp();
      return latest_ts.tv_sec != prev_timestamp.tv_sec ||
             latest_ts.tv_usec != prev_timestamp.tv_usec;
    };
    if (timeout != nullptr) {
      const auto wait = std::chrono::seconds(timeout->tv_sec) +
                        std::chrono::microseconds(timeout->tv_usec);
      if (!changed_.wait_for(lock, wait, fresh)) return false;
    } else {
      changed_.wait(lock, fresh);
    }
    *out = ring_[latest_];
    return true;
  }

 private:
  const size_t capacity_;
  std::vector<Timestamped<T>> ring_;
  size_t latest_;
  size_t valid_count_ = 0;
  mutable std::mutex mutex_;
  mutable std::condition_variable changed_;
};

// Budgeted-loop wait helper: keeps (wait + loop body) within a fixed period
// by shrinking the next wait by however long the body took
// (reference: timestamped_history.hpp:129-155).
class LoopWaitEffectiveTimeout {
 public:
  explicit LoopWaitEffectiveTimeout(timeval budget) : budget_(budget) {
    gettimeofday(&loop_start_, nullptr);
  }

  void WaitFinished() { gettimeofday(&loop_start_, nullptr); }

  timeval GetRemainingTimeout() const {
    timeval now, elapsed, remaining;
    gettimeofday(&now, nullptr);
    timersub(&now, &loop_start_, &elapsed);
    if (timercmp(&elapsed, &budget_, <)) {
      timersub(&budget_, &elapsed, &remaining);
    } else {
      remaining = {0, 0};
    }
    return remaining;
  }

 private:
  timeval budget_, loop_start_;
};

}  // namespace pgcar

#endif  // PGCAR_TIMESTAMPED_HISTORY_H_
