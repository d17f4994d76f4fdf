// Steering torque-sensor voltage spoofing box.
//
// Role (reference: sketches/kia-spoof-steering + steering-*-torque): sit
// between the Kia's torque sensor and the power-steering ECU. In passthrough
// mode, forward the two sensor voltages (green/blue channels) smoothed and
// hysteresis-held; on a serial 's<offset>' command, add a differential
// offset so the ECU believes the driver applies torque. 'r' resets to
// passthrough; 'e' reports voltages. Every accepted command is acked with
// '\r' (the host handshake in car/src/arduino_comm.cc relies on this).
//
// Hardware: two ADC channels reading the sensor (e.g. MCP3008 over HW SPI or
// the AVR's own ADC) and two DAC outputs toward the ECU (e.g. 2x MCP4725 on
// I2C). The analog drivers are factored into tiny functions below so the
// same sketch adapts to either board by editing read_sensor()/write_ecu().
//
// Shares pgcar/steering_commands.h and pgcar/voltage_smoothing.h with the
// host stack (host-side unit tests in car/tests cover both).

#include <Wire.h>

#include "../../include/pgcar/steering_commands.h"
#include "../../include/pgcar/voltage_smoothing.h"

using pgcar::kia::HistoricVoltageData;
using pgcar::kia::HysteresisOutput;
using pgcar::kia::InstantVoltage;
using pgcar::kia::KiaControlCommand;
using pgcar::kia::KiaControlCommandProcessor;

namespace {

constexpr uint8_t kGreenAdcPin = A0;
constexpr uint8_t kBlueAdcPin = A1;
constexpr uint8_t kGreenDacAddress = 0x60;  // MCP4725 #1
constexpr uint8_t kBlueDacAddress = 0x61;   // MCP4725 #2
constexpr uint16_t kHysteresisThreshold = 1;

HistoricVoltageData<4> voltage_history;  // 16-sample running average
KiaControlCommandProcessor command_processor;
KiaControlCommand command;

int16_t spoof_offset = 0;   // differential offset in DAC LSBs
uint16_t held_green = 0;
uint16_t held_blue = 0;

InstantVoltage read_sensor() {
  return {static_cast<uint16_t>(analogRead(kGreenAdcPin)),
          static_cast<uint16_t>(analogRead(kBlueAdcPin))};
}

void write_dac(uint8_t address, uint16_t value) {
  // MCP4725 fast-mode write (12-bit value).
  Wire.beginTransmission(address);
  Wire.write((value >> 8) & 0x0F);
  Wire.write(value & 0xFF);
  Wire.endTransmission();
}

void write_ecu(uint16_t green, uint16_t blue) {
  write_dac(kGreenDacAddress, green);
  write_dac(kBlueDacAddress, blue);
}

void report_voltages() {
  Serial.print(pgcar::kia::kVoltageReportTag);
  Serial.print(' ');
  Serial.print(voltage_history.avg_green());
  Serial.print(' ');
  Serial.print(voltage_history.avg_blue());
  Serial.print(' ');
  Serial.print(spoof_offset);
  Serial.print(KiaControlCommandProcessor::kCommandEnd);
}

void handle_command() {
  switch (command.type) {
    case KiaControlCommand::STEER:
      spoof_offset = command.value;
      break;
    case KiaControlCommand::RESET:
      spoof_offset = 0;
      break;
    case KiaControlCommand::ECHO_COMMAND:
      report_voltages();
      break;
    default:
      return;
  }
  // Acknowledge with the command terminator.
  Serial.print(KiaControlCommandProcessor::kCommandEnd);
}

}  // namespace

void setup() {
  Serial.begin(115200);
  Wire.begin();
}

void loop() {
  // Consume any pending serial control characters.
  while (Serial.available() > 0) {
    const auto status =
        command_processor.ConsumeChar(static_cast<char>(Serial.read()));
    if (status == KiaControlCommandProcessor::READY_OK &&
        command_processor.GetCurrentCommand(&command)) {
      handle_command();
      command_processor.startNextCommand();
    } else if (status != KiaControlCommandProcessor::INCOMPLETE) {
      command_processor.startNextCommand();
    }
  }

  // Smooth the sensor voltages and hold them through hysteresis so the
  // 8/12-bit DAC does not retransmit single-LSB jitter to the ECU.
  voltage_history.take_measurement(read_sensor());
  held_green = HysteresisOutput(held_green, voltage_history.avg_green(),
                                kHysteresisThreshold);
  held_blue = HysteresisOutput(held_blue, voltage_history.avg_blue(),
                               kHysteresisThreshold);

  // The two torque-sensor channels move differentially; apply the spoof
  // offset with opposite signs.
  write_ecu(held_green + spoof_offset, held_blue - spoof_offset);
}
