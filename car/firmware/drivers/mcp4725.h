// Minimal MCP4725 12-bit I2C DAC driver (Arduino).
//
// Replaces the reference's vendored mcp4725-lib (sketches/libs/mcp4725-lib):
// only the fast-mode write the spoof box needs.
#ifndef PGCAR_FIRMWARE_MCP4725_H_
#define PGCAR_FIRMWARE_MCP4725_H_

#include <Wire.h>
#include <stdint.h>

class Mcp4725 {
 public:
  explicit Mcp4725(uint8_t i2c_address) : address_(i2c_address) {}

  void begin() { Wire.begin(); }

  // Fast-mode write: two bytes, 12-bit value, no EEPROM persist.
  bool set_voltage(uint16_t value_12bit) {
    Wire.beginTransmission(address_);
    Wire.write((value_12bit >> 8) & 0x0F);
    Wire.write(value_12bit & 0xFF);
    return Wire.endTransmission() == 0;
  }

 private:
  const uint8_t address_;
};

#endif  // PGCAR_FIRMWARE_MCP4725_H_
