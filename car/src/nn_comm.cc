#include "pgcar/nn_comm.h"

#include <cstdlib>
#include <cstring>

// libzmq C API subset (the image has libzmq.so.5 but no zmq.h; these
// declarations match the stable libzmq 4.x ABI).
extern "C" {
void *zmq_ctx_new(void);
int zmq_ctx_term(void *context);
void *zmq_socket(void *context, int type);
int zmq_close(void *socket);
int zmq_connect(void *socket, const char *endpoint);
int zmq_setsockopt(void *socket, int option, const void *value, size_t len);
int zmq_recv(void *socket, void *buffer, size_t len, int flags);
}

namespace {
constexpr int ZMQ_SUB = 2;
constexpr int ZMQ_SUBSCRIBE = 6;
constexpr int ZMQ_RCVTIMEO = 27;
constexpr int ZMQ_CONFLATE = 54;
}  // namespace

namespace pgcar {

bool ParseSteeringPredictionJson(const std::string &message, double *degrees) {
  if (degrees == nullptr) return false;
  // Minimal parse of {"s": <number>} — whitespace-tolerant, no dependency on
  // a JSON library for this one fixed-shape realtime message.
  const size_t key = message.find("\"s\"");
  if (key == std::string::npos) return false;
  size_t pos = message.find(':', key);
  if (pos == std::string::npos) return false;
  ++pos;
  while (pos < message.size() &&
         (message[pos] == ' ' || message[pos] == '\t')) {
    ++pos;
  }
  char *end = nullptr;
  const double value = std::strtod(message.c_str() + pos, &end);
  if (end == message.c_str() + pos) return false;
  *degrees = value;
  return true;
}

SingleSteeringAnglePredictionUpdater::SingleSteeringAnglePredictionUpdater(
    const std::string &socket_address, size_t history_length,
    int receive_timeout_ms)
    : predictions_(history_length) {
  context_ = zmq_ctx_new();
  if (context_ == nullptr) return;
  socket_ = zmq_socket(context_, ZMQ_SUB);
  if (socket_ == nullptr) return;
  // Latest-value-only delivery + bounded blocking reads so stop() is timely.
  const int conflate = 1;
  zmq_setsockopt(socket_, ZMQ_CONFLATE, &conflate, sizeof(conflate));
  zmq_setsockopt(socket_, ZMQ_RCVTIMEO, &receive_timeout_ms,
                 sizeof(receive_timeout_ms));
  zmq_setsockopt(socket_, ZMQ_SUBSCRIBE, "", 0);
  if (zmq_connect(socket_, socket_address.c_str()) != 0) {
    zmq_close(socket_);
    socket_ = nullptr;
  }
}

SingleSteeringAnglePredictionUpdater::~SingleSteeringAnglePredictionUpdater() {
  stop();
  if (socket_ != nullptr) zmq_close(socket_);
  if (context_ != nullptr) zmq_ctx_term(context_);
}

void SingleSteeringAnglePredictionUpdater::start() {
  std::unique_lock<std::mutex> lock(thread_mutex_);
  if (thread_ == nullptr && socket_ != nullptr) {
    should_run_ = true;
    thread_ = std::make_unique<std::thread>(
        &SingleSteeringAnglePredictionUpdater::updateLoop, this);
  }
}

void SingleSteeringAnglePredictionUpdater::stop() {
  std::unique_lock<std::mutex> lock(thread_mutex_);
  if (thread_ != nullptr) {
    should_run_ = false;
    thread_->join();
    thread_.reset();
  }
}

void SingleSteeringAnglePredictionUpdater::updateLoop() {
  char buffer[256];
  while (should_run_) {
    const int received = zmq_recv(socket_, buffer, sizeof(buffer) - 1, 0);
    if (received <= 0) continue;  // timeout — re-check should_run_
    buffer[received] = 0;
    double degrees = 0;
    if (ParseSteeringPredictionJson(buffer, &degrees)) {
      predictions_.update_now(degrees);
    }
  }
}

}  // namespace pgcar
