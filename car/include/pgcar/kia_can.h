// Kia CAN stream dispatch into timestamped histories + reader thread.
//
// Mirrors CarMotionData(+Updater) (src/car/kia_can.cc:75-151): steering
// angle and wheel-speed frames feed two TimestampedHistory rings; a blocking
// reader thread tags frames with kernel receive timestamps.
#ifndef PGCAR_KIA_CAN_H_
#define PGCAR_KIA_CAN_H_

#include <atomic>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include "pgcar/can_frame.h"
#include "pgcar/timestamped_history.h"

namespace pgcar {
namespace kia {

class CarMotionData {
 public:
  explicit CarMotionData(size_t history_length)
      : steering_angles_(history_length), wheel_speeds_(history_length) {}

  void update(const CanFrame &frame, const timeval &timestamp);

  const TimestampedHistory<SteeringAngle> &steering_angles() const {
    return steering_angles_;
  }
  const TimestampedHistory<WheelSpeeds> &wheel_speeds() const {
    return wheel_speeds_;
  }

 private:
  TimestampedHistory<SteeringAngle> steering_angles_;
  TimestampedHistory<WheelSpeeds> wheel_speeds_;
};

class CarMotionDataUpdater {
 public:
  CarMotionDataUpdater(CarMotionData *data,
                       const std::string &can_interface_name,
                       const std::vector<uint32_t> &accepted_ids,
                       const timeval &read_timeout);
  ~CarMotionDataUpdater();

  bool ok() const { return can_fd_ >= 0; }
  void start();
  void stop();

 private:
  void updateLoop();

  CarMotionData *const data_;
  int can_fd_ = -1;
  std::mutex thread_mutex_;
  std::atomic<bool> should_run_{false};
  std::unique_ptr<std::thread> thread_;
};

}  // namespace kia
}  // namespace pgcar

#endif  // PGCAR_KIA_CAN_H_
