// ZeroMQ subscriber bridging NN steering predictions into the car stack.
//
// Wire contract (reference: src/nn_comm/nn_comm.cc:37-57 consuming
// python/predict_live.py:98-119): a PUB socket sends JSON {"s": degrees};
// the subscriber runs with CONFLATE=1 (latest-value-only) and a 50 ms
// receive timeout, feeding a TimestampedHistory<double>.
//
// libzmq is linked directly (the image ships libzmq.so.5 without headers,
// so the handful of C API entry points are declared here).
#ifndef PGCAR_NN_COMM_H_
#define PGCAR_NN_COMM_H_

#include <atomic>
#include <memory>
#include <mutex>
#include <string>
#include <thread>

#include "pgcar/timestamped_history.h"

namespace pgcar {

class SingleSteeringAnglePredictionUpdater {
 public:
  SingleSteeringAnglePredictionUpdater(const std::string &socket_address,
                                       size_t history_length,
                                       int receive_timeout_ms = 50);
  ~SingleSteeringAnglePredictionUpdater();

  bool ok() const { return socket_ != nullptr; }
  const TimestampedHistory<double> &predictions() const { return predictions_; }

  void start();
  void stop();

 private:
  void updateLoop();

  TimestampedHistory<double> predictions_;
  void *context_ = nullptr;
  void *socket_ = nullptr;
  std::mutex thread_mutex_;
  std::atomic<bool> should_run_{false};
  std::unique_ptr<std::thread> thread_;
};

// Parses the {"s": <number>} prediction message; exposed for unit tests.
bool ParseSteeringPredictionJson(const std::string &message, double *degrees);

}  // namespace pgcar

#endif  // PGCAR_NN_COMM_H_
