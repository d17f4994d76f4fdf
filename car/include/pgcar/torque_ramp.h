// Gradual torque-offset ramping for the steering spoof firmware.
//
// Behavior contract (reference: sketches/libs/kia-spoof-steering/
// spoof-voltage-smoothing.h TargetVoltageSmoother + the steering-fixed-torque
// and steering-flex-torque sketches): the ECU treats sharp voltage jumps on
// the torque-sensor line as sensor faults, so a commanded offset is applied
// as a staircase — one DAC LSB per `steps_per_adjustment_level` loop cycles —
// and, once the (nonzero) target level is reached and held for
// `steps_at_target_level` cycles, the target automatically decays back to
// zero through the same staircase. The spoof is differential: the green
// channel gets +offset, the blue channel -offset. The base (passthrough)
// voltage is the hysteresis-held running average, converted from ADC to DAC
// resolution by bit shift.
//
// Shared host/firmware header: no STL, no dynamic allocation, host-tested in
// car/tests/misc_test.cc (TorqueRamp cases).
#ifndef PGCAR_TORQUE_RAMP_H_
#define PGCAR_TORQUE_RAMP_H_

#include <stdint.h>

#include "pgcar/steering_commands.h"
#include "pgcar/voltage_smoothing.h"

namespace pgcar {
namespace kia {

struct SteeringSpoofSettings {
  // Clamp for any commanded offset, in DAC LSBs.
  int16_t max_steering_magnitude = 0;
  // Loop cycles to dwell on each intermediate 1-LSB staircase level.
  uint16_t steps_per_adjustment_level = 1;
  // Loop cycles to hold a reached nonzero target before auto-decaying to 0.
  uint16_t steps_at_target_level = 1;
  // Hysteresis threshold for the passthrough voltage (see HysteresisOutput).
  uint16_t voltage_update_hysteresis = 1;
};

class TorqueRamp {
 public:
  TorqueRamp(const SteeringSpoofSettings &settings, uint8_t adc_bits,
             uint8_t dac_bits)
      : settings_(settings), adc_bits_(adc_bits), dac_bits_(dac_bits) {}

  // Commands a new target offset (clamped to +/-max_steering_magnitude).
  // Re-commanding the level the ramp already sits at refreshes the hold
  // timer instead of letting a stream of identical commands expire it.
  void set_target_offset(int16_t target) {
    const int16_t m = settings_.max_steering_magnitude;
    if (target > m) target = m;
    if (target < -m) target = -m;
    target_ = target;
    if (target_ == current_ &&
        steps_at_level_ > settings_.steps_per_adjustment_level) {
      steps_at_level_ = settings_.steps_per_adjustment_level;
    }
  }

  // One loop() cycle: advance the staircase / hold timer.
  void step() {
    if (steps_at_level_ < UINT16_MAX) ++steps_at_level_;
    if (current_ != target_) {
      if (steps_at_level_ >= settings_.steps_per_adjustment_level) {
        current_ += (target_ > current_) ? 1 : -1;
        steps_at_level_ = 0;
      }
    } else if (target_ != 0 &&
               steps_at_level_ >= static_cast<uint32_t>(
                                      settings_.steps_at_target_level) +
                                      settings_.steps_per_adjustment_level) {
      target_ = 0;  // held long enough; decay back to passthrough
    }
  }

  // Feed the latest averaged sensor voltages (ADC units).
  void update_measurements(const InstantVoltage &averaged) {
    held_green_ = HysteresisOutput(held_green_, averaged.green,
                                   settings_.voltage_update_hysteresis);
    held_blue_ = HysteresisOutput(held_blue_, averaged.blue,
                                  settings_.voltage_update_hysteresis);
  }

  // DAC output values: passthrough +/- the current (ramped) offset.
  uint16_t out_green_dac() const { return WithOffset(held_green_, current_); }
  uint16_t out_blue_dac() const {
    return WithOffset(held_blue_, static_cast<int16_t>(-current_));
  }

  int16_t current_offset() const { return current_; }
  int16_t target_offset() const { return target_; }
  uint16_t smoothed_green_adc() const { return held_green_; }
  uint16_t smoothed_blue_adc() const { return held_blue_; }

 private:
  uint16_t WithOffset(uint16_t base_adc, int16_t offset_dac) const {
    uint16_t base_dac = base_adc;
    if (adc_bits_ > dac_bits_) {
      base_dac = static_cast<uint16_t>(base_dac >> (adc_bits_ - dac_bits_));
    } else if (dac_bits_ > adc_bits_) {
      base_dac = static_cast<uint16_t>(base_dac << (dac_bits_ - adc_bits_));
    }
    const uint16_t dac_max =
        static_cast<uint16_t>((1u << dac_bits_) - 1u);
    int32_t out = static_cast<int32_t>(base_dac) + offset_dac;
    if (out < 0) out = 0;
    if (out > dac_max) out = dac_max;
    return static_cast<uint16_t>(out);
  }

  const SteeringSpoofSettings &settings_;
  const uint8_t adc_bits_, dac_bits_;
  int16_t current_ = 0;
  int16_t target_ = 0;
  uint32_t steps_at_level_ = 0;
  uint16_t held_green_ = 0;
  uint16_t held_blue_ = 0;
};

// FIXED-TORQUE command mode (reference sketch steering-fixed-torque.ino):
// single raw characters, latest-wins — 'l' commands a full-magnitude left
// offset, 'r' a full-magnitude right offset, anything else is ignored.
// Returns true when `ramp` was given a new target.
inline bool ApplyFixedTorqueChar(char command, TorqueRamp *ramp,
                                 const SteeringSpoofSettings &settings) {
  if (command == 'l') {
    ramp->set_target_offset(settings.max_steering_magnitude);
    return true;
  }
  if (command == 'r') {
    ramp->set_target_offset(
        static_cast<int16_t>(-settings.max_steering_magnitude));
    return true;
  }
  return false;
}

// FLEX-TORQUE command mode (reference sketch steering-flex-torque.ino):
// full KiaControlCommand protocol — 's<value>' ramps to an arbitrary
// (clamped) offset, 'e<value>' toggles the voltage echo stream, 'r' resets
// the offset and the echo. Returns true when the command was recognized.
inline bool ApplyFlexTorqueCommand(const KiaControlCommand &command,
                                   TorqueRamp *ramp, bool *echo_on) {
  switch (command.type) {
    case KiaControlCommand::STEER:
      ramp->set_target_offset(command.value);
      return true;
    case KiaControlCommand::ECHO_COMMAND:
      *echo_on = command.value != 0;
      return true;
    case KiaControlCommand::RESET:
      ramp->set_target_offset(0);
      *echo_on = false;
      return true;
    default:
      return false;
  }
}

}  // namespace kia
}  // namespace pgcar

#endif  // PGCAR_TORQUE_RAMP_H_
