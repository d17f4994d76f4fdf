// Torque-sensor voltage smoothing for the steering spoof firmware.
//
// The PCF8591 DAC/ADC is 8-bit, so even 1-LSB jitter on the forwarded
// torque-sensor voltage is visible to the power-steering ECU. Two fixes
// (reference: sketches/libs/kia-spoof-steering/spoof-voltage-smoothing.h):
//   1. a running average over 2^shift samples (bit-shift divide), and
//   2. output hysteresis: the output only moves when the averaged input
//      drifts more than a threshold away from the current output.
//
// Shared host/firmware header: no STL, no dynamic allocation.
#ifndef PGCAR_VOLTAGE_SMOOTHING_H_
#define PGCAR_VOLTAGE_SMOOTHING_H_

#include <stddef.h>
#include <stdint.h>

namespace pgcar {
namespace kia {

struct InstantVoltage {
  uint16_t green = 0;
  uint16_t blue = 0;
};

template <uint8_t kAveragingShift> class HistoricVoltageData {
 public:
  static constexpr size_t kBufferSize = static_cast<size_t>(1)
                                        << kAveragingShift;

  void take_measurement(const InstantVoltage &sample) {
    index_ = (index_ + 1) % kBufferSize;
    Replace(&green_[index_], &green_total_, sample.green);
    Replace(&blue_[index_], &blue_total_, sample.blue);
  }

  uint16_t avg_green() const {
    return static_cast<uint16_t>(green_total_ >> kAveragingShift);
  }
  uint16_t avg_blue() const {
    return static_cast<uint16_t>(blue_total_ >> kAveragingShift);
  }
  InstantVoltage avg() const { return {avg_green(), avg_blue()}; }
  uint16_t latest_green() const { return green_[index_]; }
  uint16_t latest_blue() const { return blue_[index_]; }
  size_t buffer_size() const { return kBufferSize; }

 private:
  static void Replace(uint16_t *slot, uint32_t *total, uint16_t value) {
    *total -= *slot;
    *slot = value;
    *total += value;
  }

  uint16_t green_[kBufferSize] = {};
  uint16_t blue_[kBufferSize] = {};
  uint32_t green_total_ = 0;
  uint32_t blue_total_ = 0;
  size_t index_ = kBufferSize - 1;
};

// Hysteresis: move the held output level to `averaged_input` only when it
// has drifted strictly more than `threshold` away.
inline uint16_t HysteresisOutput(uint16_t held_output, uint16_t averaged_input,
                                 uint16_t threshold) {
  const uint16_t diff = held_output > averaged_input
                            ? held_output - averaged_input
                            : averaged_input - held_output;
  return diff > threshold ? averaged_input : held_output;
}

}  // namespace kia
}  // namespace pgcar

#endif  // PGCAR_VOLTAGE_SMOOTHING_H_
