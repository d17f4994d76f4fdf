// Steer-by-wire bang-bang controller: hold a target steering-wheel angle by
// stepping the spoof torque voltage.
//
// Same control law as the reference (src/car/kia_steering_angle_holder.cc):
// a piecewise-linear angular-velocity envelope around the angle residual
// decides whether the torque steps up, down, or holds; a 2nd-order Kalman
// filter smooths the CAN angle sensor; the 200 ms control loop predicts 0.2 s
// ahead; a sensor timeout clears the target, zeroes torque and resets the
// estimator.
#ifndef PGCAR_STEERING_ANGLE_HOLDER_H_
#define PGCAR_STEERING_ANGLE_HOLDER_H_

#include <atomic>
#include <memory>
#include <mutex>
#include <thread>

#include "pgcar/can_frame.h"
#include "pgcar/kalman_filter.h"
#include "pgcar/steering_commands.h"
#include "pgcar/timestamped_history.h"

namespace pgcar {
namespace kia {

struct SteeringAngleHolderSettings {
  static constexpr double kAngleAmplitudeHardLimit = 180.0;
  static constexpr int16_t kTorqueHardLimit = 300;

  // Zero torque beyond this measured angle amplitude (hardware protection).
  double max_angle_amplitude_for_torque = 180.0;
  // Largest accepted target angle; must leave margin below the torque limit
  // so the controller can push back toward zero.
  double max_target_angle_amplitude = 90.0;
  int16_t max_torque = 80;

  // Angular-velocity envelope: within this residual of the target, zero
  // angular velocity is acceptable...
  double target_angle_accuracy_tolerance_degrees = 1.0;
  // ...and from this residual on, the full minimum rotation speed applies,
  // with a linear ramp in between.
  double target_angle_diff_full_angular_velocity_lower_bound = 10.0;
  double min_steering_rotation_degrees_per_second = 90.0;
  double max_steering_rotation_degrees_per_second = 270.0;

  double kalman_filter_observation_variance = 2.0;
  double kalman_filter_perturbation_variance_per_second = 1e8;

  double lookahead_estimate_time_sec = 0.2;
  double lookahead_acceleration_scale = 0.8;
  double torque_change_step = 0.2;

  bool IsValid() const;
};

// One step of the torque policy: returns the new fine-grained torque given
// the current one, the target/measured angles and the angular velocity.
double BoundedRotationVelocityEffectiveTorque(
    double torque_voltage_finegrained, double target_angle_degrees,
    double measured_angle_degrees, double angular_velocity_degrees_per_second,
    const SteeringAngleHolderSettings &settings);

// Exposed for testing: is the angular velocity above the piecewise-linear
// envelope for the given residual?
bool IsAngularVelocityAboveUpperBound(
    double angular_velocity, double target_angle_residual,
    const SteeringAngleHolderSettings &settings);

struct TargetSteeringAngleStatus {
  bool is_set = false;
  double angle_degrees = 0;
};

// Abstract command sink so the controller is testable without a serial
// device (production implementation: ArduinoCommandChannel).
class CommandSink {
 public:
  virtual ~CommandSink() = default;
  virtual bool SendCommand(const KiaControlCommand &command) = 0;
};

class SteeringAngleHolderController {
 public:
  SteeringAngleHolderController(
      const TimestampedHistory<SteeringAngle> *steering_angle_sensor,
      CommandSink *command_sink,
      const SteeringAngleHolderSettings &settings = {},
      int64_t loop_period_usec = 200000);
  ~SteeringAngleHolderController();

  const SteeringAngleHolderSettings &settings() const { return settings_; }
  const TimestampedHistory<TargetSteeringAngleStatus> &
  TargetSteeringAnglesHistory() const {
    return target_history_;
  }

  bool SetTargetAngle(double target_angle_degrees);
  void ClearTargetAngle();
  bool IsTargetAngleSet() const { return is_target_set_; }

  void RequestStop() { must_run_ = false; }
  void Join();
  void Stop();

 private:
  void ControllerLoop();

  const TimestampedHistory<SteeringAngle> *const sensor_;
  CommandSink *const sink_;
  const SteeringAngleHolderSettings settings_;
  const int64_t loop_period_usec_;

  TimestampedHistory<TargetSteeringAngleStatus> target_history_{5};
  std::unique_ptr<KalmanFilter1D2Order> filter_;
  std::mutex mutex_;
  bool is_target_set_ = false;
  double target_angle_degrees_ = 0;
  std::atomic<bool> must_run_{true};
  std::unique_ptr<std::thread> loop_thread_;
};

// Bridges a stream of predicted steering angles into controller targets;
// clears the target when the stream stalls past the wait timeout.
class SteeringAngleHolderFeeder {
 public:
  SteeringAngleHolderFeeder(SteeringAngleHolderController *controller,
                            const TimestampedHistory<double> *steering_feed,
                            bool clip_target_angle,
                            int64_t wait_timeout_usec = 400000);

  void Start();
  void Stop();
  void SetFeedEnabled(bool must_feed);

 private:
  void FeedLoop();

  SteeringAngleHolderController *const controller_;
  const TimestampedHistory<double> *const feed_;
  const bool clip_target_angle_;
  const int64_t wait_timeout_usec_;

  std::mutex thread_mutex_;
  std::mutex feed_enabled_mutex_;
  bool must_feed_ = true;
  std::atomic<bool> must_run_{false};
  std::unique_ptr<std::thread> thread_;
};

}  // namespace kia
}  // namespace pgcar

#endif  // PGCAR_STEERING_ANGLE_HOLDER_H_
