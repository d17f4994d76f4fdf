#include "pgcar/steering_angle_holder.h"

#include <algorithm>
#include <cmath>

#include "pgcar/check.h"

namespace pgcar {
namespace kia {

bool SteeringAngleHolderSettings::IsValid() const {
  if (max_angle_amplitude_for_torque < 0 ||
      max_angle_amplitude_for_torque > kAngleAmplitudeHardLimit)
    return false;
  if (max_target_angle_amplitude < 0 ||
      max_target_angle_amplitude > kAngleAmplitudeHardLimit)
    return false;
  // The target range must leave control margin below the torque cutoff.
  if (max_target_angle_amplitude >= max_angle_amplitude_for_torque)
    return false;
  if (max_torque < 0 || max_torque > kTorqueHardLimit) return false;
  if (target_angle_accuracy_tolerance_degrees <= 0) return false;
  if (target_angle_diff_full_angular_velocity_lower_bound < 0) return false;
  if (target_angle_accuracy_tolerance_degrees >
      target_angle_diff_full_angular_velocity_lower_bound)
    return false;
  if (min_steering_rotation_degrees_per_second < 0 ||
      max_steering_rotation_degrees_per_second < 0)
    return false;
  if (min_steering_rotation_degrees_per_second >=
      max_steering_rotation_degrees_per_second)
    return false;
  if (kalman_filter_observation_variance <= 0 ||
      kalman_filter_perturbation_variance_per_second <= 0)
    return false;
  if (lookahead_estimate_time_sec < 0) return false;
  if (lookahead_acceleration_scale < 0) return false;
  if (torque_change_step <= 0) return false;
  return true;
}

// The envelope is a shifted ramp:
//   residual <= -full_velocity_bound      -> -min_rotation_speed
//   residual in (-full_velocity_bound, +inf) -> line through
//       (-full_velocity_bound, -min_rotation_speed) and (-tolerance, 0)
// plus a hard cap at +max_rotation_speed.
bool IsAngularVelocityAboveUpperBound(
    double angular_velocity, double target_angle_residual,
    const SteeringAngleHolderSettings &settings) {
  if (target_angle_residual <=
      -settings.target_angle_diff_full_angular_velocity_lower_bound) {
    return angular_velocity >
           -settings.min_steering_rotation_degrees_per_second;
  }
  if (angular_velocity > settings.max_steering_rotation_degrees_per_second) {
    return true;
  }
  const double slope =
      settings.min_steering_rotation_degrees_per_second /
      (settings.target_angle_diff_full_angular_velocity_lower_bound -
       settings.target_angle_accuracy_tolerance_degrees);
  const double bound =
      slope * (target_angle_residual +
               settings.target_angle_diff_full_angular_velocity_lower_bound) -
      settings.min_steering_rotation_degrees_per_second;
  return angular_velocity > bound;
}

double BoundedRotationVelocityEffectiveTorque(
    double torque_voltage_finegrained, double target_angle_degrees,
    double measured_angle_degrees, double angular_velocity_degrees_per_second,
    const SteeringAngleHolderSettings &settings) {
  if (std::abs(measured_angle_degrees) >
      settings.max_angle_amplitude_for_torque) {
    // Out of the safe angle range: drop all torque to protect the rack.
    return 0;
  }
  if (std::abs(torque_voltage_finegrained) > settings.max_torque + 1) {
    // Inconsistent input state; fail safe.
    return 0;
  }
  const double residual = target_angle_degrees - measured_angle_degrees;
  double result = torque_voltage_finegrained;
  if (IsAngularVelocityAboveUpperBound(angular_velocity_degrees_per_second,
                                       residual, settings)) {
    result -= settings.torque_change_step;  // turning too fast: back off
  } else if (IsAngularVelocityAboveUpperBound(
                 -angular_velocity_degrees_per_second, -residual, settings)) {
    result += settings.torque_change_step;  // turning too slow: push harder
  }
  return std::clamp(result, -static_cast<double>(settings.max_torque),
                    static_cast<double>(settings.max_torque));
}

SteeringAngleHolderController::SteeringAngleHolderController(
    const TimestampedHistory<SteeringAngle> *steering_angle_sensor,
    CommandSink *command_sink, const SteeringAngleHolderSettings &settings,
    int64_t loop_period_usec)
    : sensor_(steering_angle_sensor),
      sink_(command_sink),
      settings_(settings),
      loop_period_usec_(loop_period_usec) {
  PG_CHECK_NOTNULL(sensor_);
  PG_CHECK_NOTNULL(sink_);
  PG_CHECK(settings_.IsValid());
  filter_ = std::make_unique<KalmanFilter1D2Order>(
      settings_.kalman_filter_observation_variance,
      settings_.kalman_filter_perturbation_variance_per_second);
  loop_thread_ = std::make_unique<std::thread>(
      &SteeringAngleHolderController::ControllerLoop, this);
}

SteeringAngleHolderController::~SteeringAngleHolderController() {
  if (loop_thread_ && loop_thread_->joinable()) Stop();
}

bool SteeringAngleHolderController::SetTargetAngle(double target_angle_degrees) {
  if (std::abs(target_angle_degrees) > settings_.max_target_angle_amplitude)
    return false;
  std::unique_lock<std::mutex> lock(mutex_);
  is_target_set_ = true;
  target_angle_degrees_ = target_angle_degrees;
  target_history_.update_now({true, target_angle_degrees});
  return true;
}

void SteeringAngleHolderController::ClearTargetAngle() {
  std::unique_lock<std::mutex> lock(mutex_);
  is_target_set_ = false;
  target_history_.update_now({false, 0});
}

void SteeringAngleHolderController::Join() { loop_thread_->join(); }

void SteeringAngleHolderController::Stop() {
  RequestStop();
  Join();
}

void SteeringAngleHolderController::ControllerLoop() {
  Timestamped<SteeringAngle> reading = {{}, {0, 0}};
  KiaControlCommand command{};
  command.type = KiaControlCommand::STEER;
  bool first_measurement = true;
  // Fine-grained (fractional) torque level; the wire command rounds to int,
  // fractional steps let the average change rate be below 1 unit/iteration.
  double torque = 0;

  LoopWaitEffectiveTimeout loop_timeout(
      {loop_period_usec_ / 1000000, loop_period_usec_ % 1000000});
  while (must_run_) {
    timeval wait_timeout = loop_timeout.GetRemainingTimeout();
    const bool got_reading =
        sensor_->wait_get_next(reading.timestamp(), &wait_timeout, &reading);
    loop_timeout.WaitFinished();

    if (got_reading && reading.data().angle_deci_degrees !=
                           kSteeringWheelAngleInvalidValue) {
      filter_->Update({reading.data().degrees(), reading.timestamp()});
      const auto &estimate = filter_->LatestEstimate().data();

      if (first_measurement) {
        // Velocity/acceleration are initialization artifacts on the first
        // sample; skip control this round.
        first_measurement = false;
        continue;
      }

      const double angle = estimate.mean(0, 0);
      const double velocity = estimate.mean(1, 0);
      const double acceleration =
          settings_.lookahead_acceleration_scale * estimate.mean(2, 0);
      const double t = settings_.lookahead_estimate_time_sec;
      const double lookahead_velocity = velocity + acceleration * t;
      const double lookahead_angle =
          angle + velocity * t + 0.5 * acceleration * t * t;

      std::unique_lock<std::mutex> lock(mutex_);
      if (is_target_set_) {
        torque = BoundedRotationVelocityEffectiveTorque(
            torque, target_angle_degrees_, lookahead_angle, lookahead_velocity,
            settings_);
      } else {
        torque = 0;
      }
    } else {
      // Sensor timeout: car off or CAN down. Fail safe and restart the
      // estimator from scratch.
      ClearTargetAngle();
      torque = 0;
      filter_ = std::make_unique<KalmanFilter1D2Order>(
          settings_.kalman_filter_observation_variance,
          settings_.kalman_filter_perturbation_variance_per_second);
      first_measurement = true;
    }
    command.value = static_cast<int16_t>(torque);
    sink_->SendCommand(command);
  }
}

SteeringAngleHolderFeeder::SteeringAngleHolderFeeder(
    SteeringAngleHolderController *controller,
    const TimestampedHistory<double> *steering_feed, bool clip_target_angle,
    int64_t wait_timeout_usec)
    : controller_(controller),
      feed_(steering_feed),
      clip_target_angle_(clip_target_angle),
      wait_timeout_usec_(wait_timeout_usec) {
  PG_CHECK_NOTNULL(controller_);
  PG_CHECK_NOTNULL(feed_);
}

void SteeringAngleHolderFeeder::Start() {
  std::unique_lock<std::mutex> lock(thread_mutex_);
  if (thread_ == nullptr) {
    must_run_ = true;
    thread_ = std::make_unique<std::thread>(
        &SteeringAngleHolderFeeder::FeedLoop, this);
  }
}

void SteeringAngleHolderFeeder::Stop() {
  std::unique_lock<std::mutex> lock(thread_mutex_);
  if (thread_ != nullptr) {
    must_run_ = false;
    thread_->join();
    thread_.reset();
  }
}

void SteeringAngleHolderFeeder::SetFeedEnabled(bool must_feed) {
  std::unique_lock<std::mutex> lock(feed_enabled_mutex_);
  must_feed_ = must_feed;
  if (!must_feed) controller_->ClearTargetAngle();
}

void SteeringAngleHolderFeeder::FeedLoop() {
  Timestamped<double> prediction = {0, {0, 0}};
  const timeval timeout = {wait_timeout_usec_ / 1000000,
                           wait_timeout_usec_ % 1000000};
  while (must_run_) {
    const bool got_prediction =
        feed_->wait_get_next(prediction.timestamp(), &timeout, &prediction);
    std::unique_lock<std::mutex> lock(feed_enabled_mutex_);
    if (!must_feed_) continue;
    if (got_prediction) {
      const double limit = controller_->settings().max_target_angle_amplitude;
      const double angle =
          clip_target_angle_
              ? std::clamp(prediction.data(), -limit, limit)
              : prediction.data();
      controller_->SetTargetAngle(angle);
    } else {
      // Prediction stream stalled: stop holding a stale direction.
      controller_->ClearTargetAngle();
    }
  }
}

}  // namespace kia
}  // namespace pgcar
