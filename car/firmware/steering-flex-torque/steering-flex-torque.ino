// Flex-torque steer-by-wire box (reference:
// sketches/steering-flex-torque/steering-flex-torque.ino). Full
// KiaControlCommand serial protocol: 's<value>' ramps to an arbitrary
// clamped torque offset (this is what the host ArduinoCommandChannel
// sends), 'e<0|1>' toggles a periodic voltage echo line, 'r' resets to
// passthrough. Every accepted command is acked with '\r'
// (car/src/arduino_comm.cc's handshake relies on this). The offset ramp and
// the command handlers are shared, host-tested code
// (pgcar/torque_ramp.h; car/tests/misc_test.cc TorqueRamp cases).

#include <Wire.h>

#include "../../include/pgcar/steering_commands.h"
#include "../../include/pgcar/torque_ramp.h"
#include "../../include/pgcar/voltage_smoothing.h"

using pgcar::kia::ApplyFlexTorqueCommand;
using pgcar::kia::HistoricVoltageData;
using pgcar::kia::KiaControlCommand;
using pgcar::kia::KiaControlCommandProcessor;
using pgcar::kia::SteeringSpoofSettings;
using pgcar::kia::TorqueRamp;

namespace {

constexpr uint8_t kGreenAdcPin = A0;
constexpr uint8_t kBlueAdcPin = A1;
constexpr uint8_t kGreenDacAddress = 0x60;
constexpr uint8_t kBlueDacAddress = 0x61;
constexpr int kEchoEvery = 100;

SteeringSpoofSettings settings;
HistoricVoltageData<4> voltage_history;
TorqueRamp ramp(settings, /*adc_bits=*/10, /*dac_bits=*/12);
KiaControlCommandProcessor command_processor;
KiaControlCommand command;
bool echo_on = false;
int step_idx = 0;

void write_dac(uint8_t address, uint16_t value) {
  Wire.beginTransmission(address);
  Wire.write((value >> 8) & 0x0F);
  Wire.write(value & 0xFF);
  Wire.endTransmission();
}

void report_voltages() {
  Serial.print(pgcar::kia::kVoltageReportTag);
  Serial.print(' ');
  Serial.print(ramp.smoothed_blue_adc());
  Serial.print(' ');
  Serial.print(ramp.smoothed_green_adc());
  Serial.print(' ');
  Serial.print(ramp.current_offset());
  Serial.print(' ');
  Serial.print(ramp.target_offset());
  Serial.print(KiaControlCommandProcessor::kCommandEnd);
}

}  // namespace

void setup() {
  // Reference tuning: fast staircase, moderate hold.
  settings.max_steering_magnitude = 5;
  settings.steps_per_adjustment_level = 2;
  settings.steps_at_target_level = 200;
  settings.voltage_update_hysteresis = 1;

  Serial.begin(115200);
  Wire.begin();

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

  while (Serial.available() > 0) {
    const auto status =
        command_processor.ConsumeChar(static_cast<char>(Serial.read()));
    if (status == KiaControlCommandProcessor::READY_OK &&
        command_processor.GetCurrentCommand(&command) &&
        ApplyFlexTorqueCommand(command, &ramp, &echo_on)) {
      Serial.print(KiaControlCommandProcessor::kCommandEnd);  // ack
      command_processor.startNextCommand();
    } else if (status != KiaControlCommandProcessor::INCOMPLETE) {
      command_processor.startNextCommand();
    }
  }

  ramp.step();

  step_idx = (step_idx + 1) % kEchoEvery;
  if (step_idx == 0 && echo_on) report_voltages();

  write_dac(kBlueDacAddress, ramp.out_blue_dac());
  write_dac(kGreenDacAddress, ramp.out_green_dac());
}
