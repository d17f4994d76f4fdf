// Minimal MCP3008 10-bit ADC driver over hardware SPI (Arduino).
//
// Replaces the reference's vendored mcp3008-hw-spi lib
// (sketches/libs/mcp3008-hw-spi): single-ended channel reads for the
// torque-sensor voltages.
#ifndef PGCAR_FIRMWARE_MCP3008_H_
#define PGCAR_FIRMWARE_MCP3008_H_

#include <SPI.h>
#include <stdint.h>

class Mcp3008 {
 public:
  explicit Mcp3008(uint8_t chip_select_pin) : cs_(chip_select_pin) {}

  void begin() {
    pinMode(cs_, OUTPUT);
    digitalWrite(cs_, HIGH);
    SPI.begin();
  }

  // Single-ended read of channel 0..7, returns 0..1023.
  uint16_t read_channel(uint8_t channel) {
    SPI.beginTransaction(SPISettings(1350000, MSBFIRST, SPI_MODE0));
    digitalWrite(cs_, LOW);
    SPI.transfer(0x01);  // start bit
    const uint8_t high = SPI.transfer(0x80 | (channel << 4));  // single-ended
    const uint8_t low = SPI.transfer(0x00);
    digitalWrite(cs_, HIGH);
    SPI.endTransaction();
    return (static_cast<uint16_t>(high & 0x03) << 8) | low;
  }

 private:
  const uint8_t cs_;
};

#endif  // PGCAR_FIRMWARE_MCP3008_H_
