#include "pgcar/kia_can.h"

#include <sys/socket.h>
#include <unistd.h>

#include "pgcar/can_socket.h"
#include "pgcar/check.h"

namespace pgcar {
namespace kia {

void CarMotionData::update(const CanFrame &frame, const timeval &timestamp) {
  switch (frame.id) {
    case kSteeringWheelAngleCanId: {
      SteeringAngle angle;
      if (ParseSteeringAngle(frame, &angle)) {
        steering_angles_.update(angle, timestamp);
      }
      break;
    }
    case kVelocityCanId: {
      WheelSpeeds speeds;
      if (ParseWheelSpeeds(frame, &speeds)) {
        wheel_speeds_.update(speeds, timestamp);
      }
      break;
    }
    default:
      break;
  }
}

CarMotionDataUpdater::CarMotionDataUpdater(
    CarMotionData *data, const std::string &can_interface_name,
    const std::vector<uint32_t> &accepted_ids, const timeval &read_timeout)
    : data_(data) {
  PG_CHECK_NOTNULL(data_);
  can_fd_ = ConnectCanSocket(can_interface_name, accepted_ids);
  if (can_fd_ >= 0) {
    setsockopt(can_fd_, SOL_SOCKET, SO_RCVTIMEO, &read_timeout,
               sizeof(read_timeout));
  }
}

CarMotionDataUpdater::~CarMotionDataUpdater() {
  stop();
  if (can_fd_ >= 0) close(can_fd_);
}

void CarMotionDataUpdater::start() {
  std::unique_lock<std::mutex> lock(thread_mutex_);
  if (thread_ == nullptr && can_fd_ >= 0) {
    should_run_ = true;
    thread_ =
        std::make_unique<std::thread>(&CarMotionDataUpdater::updateLoop, this);
  }
}

void CarMotionDataUpdater::stop() {
  std::unique_lock<std::mutex> lock(thread_mutex_);
  if (thread_ != nullptr) {
    should_run_ = false;
    thread_->join();
    thread_.reset();
  }
}

void CarMotionDataUpdater::updateLoop() {
  CanFrame frame;
  timeval timestamp;
  while (should_run_) {
    if (ReadCanFrame(can_fd_, &frame, &timestamp)) {
      data_->update(frame, timestamp);
    }
  }
}

}  // namespace kia
}  // namespace pgcar
