// Fixed-torque steer-by-wire proof of concept (reference:
// sketches/steering-fixed-torque/steering-fixed-torque.ino). Single-char
// serial control, latest-wins: 'l' ramps a full-magnitude LEFT torque
// offset onto the spoofed torque-sensor voltages, 'r' a full-magnitude
// RIGHT offset; the offset staircases up at one DAC LSB per
// steps_per_adjustment_level cycles, holds for steps_at_target_level
// cycles, then decays back to passthrough on its own (TorqueRamp,
// host-tested in car/tests/misc_test.cc).
//
// Hardware: PCF8591-class 8-bit ADC/DAC pair — the AVR's analog pins read
// the sensor; two I2C DACs drive the ECU side.

#include <Wire.h>

#include "../../include/pgcar/torque_ramp.h"
#include "../../include/pgcar/voltage_smoothing.h"

using pgcar::kia::ApplyFixedTorqueChar;
using pgcar::kia::HistoricVoltageData;
using pgcar::kia::SteeringSpoofSettings;
using pgcar::kia::TorqueRamp;

namespace {

constexpr uint8_t kGreenAdcPin = A0;
constexpr uint8_t kBlueAdcPin = A1;
constexpr uint8_t kGreenDacAddress = 0x60;
constexpr uint8_t kBlueDacAddress = 0x61;
constexpr int kDebugPrintEvery = 100;

SteeringSpoofSettings settings;
HistoricVoltageData<4> voltage_history;  // 16-sample running average
TorqueRamp ramp(settings, /*adc_bits=*/10, /*dac_bits=*/12);
int step_idx = 0;

void write_dac(uint8_t address, uint16_t value) {
  Wire.beginTransmission(address);
  Wire.write((value >> 8) & 0x0F);
  Wire.write(value & 0xFF);
  Wire.endTransmission();
}

}  // namespace

void setup() {
  // Reference tuning: small fixed magnitude, slow staircase, long hold.
  settings.max_steering_magnitude = 5;
  settings.steps_per_adjustment_level = 20;
  settings.steps_at_target_level = 400;
  settings.voltage_update_hysteresis = 1;

  Serial.begin(115200);
  Wire.begin();

  // Warm up the averaging window before driving the ECU.
  for (size_t i = 0; i < voltage_history.buffer_size(); ++i) {
    voltage_history.take_measurement(
        {static_cast<uint16_t>(analogRead(kGreenAdcPin)),
         static_cast<uint16_t>(analogRead(kBlueAdcPin))});
  }
}

void loop() {
  voltage_history.take_measurement(
      {static_cast<uint16_t>(analogRead(kGreenAdcPin)),
       static_cast<uint16_t>(analogRead(kBlueAdcPin))});
  ramp.update_measurements(voltage_history.avg());

  // Latest-wins: drain the serial buffer and act on the final command only,
  // so queued-up stale commands never play back in sequence.
  char command = 0;
  while (Serial.available() > 0) command = static_cast<char>(Serial.read());
  if (command != 0) ApplyFixedTorqueChar(command, &ramp, settings);

  ramp.step();

  step_idx = (step_idx + 1) % kDebugPrintEvery;
  if (step_idx == 0) {
    Serial.print(ramp.out_blue_dac());
    Serial.print(',');
    Serial.print(ramp.out_green_dac());
    Serial.print(',');
    Serial.println(ramp.current_offset());
  }

  write_dac(kBlueDacAddress, ramp.out_blue_dac());
  write_dac(kGreenDacAddress, ramp.out_green_dac());
}
