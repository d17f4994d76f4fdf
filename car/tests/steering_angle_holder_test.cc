#include "pgcar/steering_angle_holder.h"

#include <algorithm>
#include <vector>

#include "pgcar/testing.h"

using pgcar::Timestamped;
using pgcar::TimestampedHistory;
using pgcar::kia::BoundedRotationVelocityEffectiveTorque;
using pgcar::kia::IsAngularVelocityAboveUpperBound;
using pgcar::kia::KiaControlCommand;
using pgcar::kia::SteeringAngle;
using pgcar::kia::SteeringAngleHolderController;
using pgcar::kia::SteeringAngleHolderSettings;

namespace {
SteeringAngleHolderSettings DefaultSettings() { return {}; }
}  // namespace

TEST(Settings, DefaultsAreValid) { EXPECT_TRUE(DefaultSettings().IsValid()); }

TEST(Settings, InvalidCombinationsRejected) {
  auto s = DefaultSettings();
  s.max_target_angle_amplitude = s.max_angle_amplitude_for_torque;
  EXPECT_FALSE(s.IsValid());  // no control margin

  s = DefaultSettings();
  s.max_torque = SteeringAngleHolderSettings::kTorqueHardLimit + 1;
  EXPECT_FALSE(s.IsValid());

  s = DefaultSettings();
  s.target_angle_accuracy_tolerance_degrees =
      s.target_angle_diff_full_angular_velocity_lower_bound + 1;
  EXPECT_FALSE(s.IsValid());

  s = DefaultSettings();
  s.min_steering_rotation_degrees_per_second =
      s.max_steering_rotation_degrees_per_second;
  EXPECT_FALSE(s.IsValid());

  s = DefaultSettings();
  s.torque_change_step = 0;
  EXPECT_FALSE(s.IsValid());
}

TEST(VelocityEnvelope, PiecewiseShape) {
  const auto s = DefaultSettings();
  // Far below the target (residual <= -10): bound is -min speed (-90).
  EXPECT_TRUE(IsAngularVelocityAboveUpperBound(-80, -20, s));
  EXPECT_FALSE(IsAngularVelocityAboveUpperBound(-100, -20, s));
  // At residual -tolerance (-1): the ramp hits zero.
  EXPECT_TRUE(IsAngularVelocityAboveUpperBound(1, -1, s));
  EXPECT_FALSE(IsAngularVelocityAboveUpperBound(-1, -1, s));
  // Above the hard cap it is always too fast.
  EXPECT_TRUE(IsAngularVelocityAboveUpperBound(
      s.max_steering_rotation_degrees_per_second + 1, 100, s));
}

TEST(TorquePolicy, OutOfBoundsAngleZeroesTorque) {
  const auto s = DefaultSettings();
  EXPECT_NEAR(BoundedRotationVelocityEffectiveTorque(
                  50, 0, s.max_angle_amplitude_for_torque + 1, 0, s),
              0.0, 1e-12);
  EXPECT_NEAR(BoundedRotationVelocityEffectiveTorque(
                  50, 0, -(s.max_angle_amplitude_for_torque + 1), 0, s),
              0.0, 1e-12);
}

TEST(TorquePolicy, ExcessiveInputTorqueZeroes) {
  const auto s = DefaultSettings();
  EXPECT_NEAR(
      BoundedRotationVelocityEffectiveTorque(s.max_torque + 2, 0, 0, 0, s),
      0.0, 1e-12);
}

TEST(TorquePolicy, WithinEnvelopeUnchanged) {
  const auto s = DefaultSettings();
  // On target with zero angular velocity: inside both envelopes.
  EXPECT_NEAR(BoundedRotationVelocityEffectiveTorque(10, 0, 0, 0, s), 10.0,
              1e-12);
}

TEST(TorquePolicy, TooFastStepsDown_TooSlowStepsUp) {
  const auto s = DefaultSettings();
  // Far below target (residual +40) but not rotating: too slow -> step up.
  EXPECT_NEAR(BoundedRotationVelocityEffectiveTorque(10, 40, 0, 0, s),
              10.0 + s.torque_change_step, 1e-12);
  // Far above target (residual -40) and not rotating: too slow in the other
  // direction -> step down.
  EXPECT_NEAR(BoundedRotationVelocityEffectiveTorque(10, -40, 0, 0, s),
              10.0 - s.torque_change_step, 1e-12);
  // Rotating way too fast toward the target: back off.
  EXPECT_NEAR(BoundedRotationVelocityEffectiveTorque(
                  10, 40, 0, s.max_steering_rotation_degrees_per_second + 10,
                  s),
              10.0 - s.torque_change_step, 1e-12);
}

TEST(TorquePolicy, SaturatesAtMaxTorque) {
  const auto s = DefaultSettings();
  EXPECT_NEAR(BoundedRotationVelocityEffectiveTorque(
                  s.max_torque + 0.5, 40, 0, 0, s),
              static_cast<double>(s.max_torque), 1e-12);
  EXPECT_NEAR(BoundedRotationVelocityEffectiveTorque(
                  -(s.max_torque + 0.5), -40, 0, 0, s),
              -static_cast<double>(s.max_torque), 1e-12);
}

namespace {
// Command sink capturing everything the controller sends.
class RecordingSink : public pgcar::kia::CommandSink {
 public:
  bool SendCommand(const KiaControlCommand &command) override {
    std::unique_lock<std::mutex> lock(mutex_);
    commands_.push_back(command);
    return true;
  }
  std::vector<KiaControlCommand> commands() {
    std::unique_lock<std::mutex> lock(mutex_);
    return commands_;
  }

 private:
  std::mutex mutex_;
  std::vector<KiaControlCommand> commands_;
};
}  // namespace

TEST(Controller, DrivesTorqueTowardTarget) {
  // Integration: a synthetic angle sensor holds the wheel at 0 while the
  // target is +30 degrees; the controller must ramp positive torque.
  TimestampedHistory<SteeringAngle> sensor(16);
  RecordingSink sink;
  SteeringAngleHolderSettings settings;
  // Loop budget must comfortably exceed the sensor period, otherwise every
  // wait times out and the controller (correctly) fails safe.
  SteeringAngleHolderController controller(&sensor, &sink, settings,
                                           50000 /* 50 ms loop budget */);
  EXPECT_TRUE(controller.SetTargetAngle(30));
  EXPECT_FALSE(controller.SetTargetAngle(
      settings.max_target_angle_amplitude + 1));

  for (int i = 0; i < 60; ++i) {
    timeval ts = {i / 100, (i % 100) * 10000};
    sensor.update({0 /* deci-degrees */}, ts);
    usleep(3000);
  }
  controller.Stop();

  const auto commands = sink.commands();
  EXPECT_TRUE(commands.size() > 10);
  EXPECT_TRUE(commands.back().type == KiaControlCommand::STEER);
  // Fine torque grows by 0.2/iteration and is truncated to int on the wire
  // (a trailing timeout iteration may zero the very last command).
  int16_t max_torque_sent = 0;
  for (const auto &c : commands) max_torque_sent = std::max(max_torque_sent, c.value);
  EXPECT_TRUE(max_torque_sent > 2);
}

TEST(Controller, SensorTimeoutClearsTargetAndTorque) {
  TimestampedHistory<SteeringAngle> sensor(16);
  RecordingSink sink;
  SteeringAngleHolderController controller(&sensor, &sink, {}, 10000);
  controller.SetTargetAngle(30);
  // Feed a few samples, then go silent past the loop timeout.
  for (int i = 0; i < 10; ++i) {
    timeval ts = {0, i * 10000};
    sensor.update({0}, ts);
    usleep(3000);
  }
  usleep(30000);  // several loop periods with no sensor data
  controller.Stop();
  EXPECT_FALSE(controller.IsTargetAngleSet());
  const auto commands = sink.commands();
  EXPECT_TRUE(!commands.empty());
  EXPECT_EQ(commands.back().value, 0);
}

PGTEST_MAIN()
