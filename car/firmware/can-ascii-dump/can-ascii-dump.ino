// Hex dump of CAN traffic from an MCP2515 shield to the serial port
// (reference tools: sketches/can-ascii-dump and the vendored
// arduino-canbus-monitor; both sit on the vendored mcp_can library).
//
// This version carries its own minimal MCP2515 driver — just enough SPI
// register access to configure 500 kbps C-CAN listen-only mode and drain
// the two receive buffers — so no third-party library is vendored. Output
// format matches the host-side parser (pgcar::TryParseCanFrame,
// car/include/pgcar/can_frame.h): "<id-hex> <byte0> <byte1> ...", one frame
// per line, making the dump directly replayable through process_can_frames.

#include <SPI.h>

namespace {

constexpr uint8_t kCsPin = 10;

// MCP2515 SPI instructions.
constexpr uint8_t kCmdReset = 0xC0;
constexpr uint8_t kCmdRead = 0x03;
constexpr uint8_t kCmdWrite = 0x02;
constexpr uint8_t kCmdReadStatus = 0xA0;
constexpr uint8_t kCmdReadRx0 = 0x90;  // READ RX BUFFER, start at RXB0SIDH
constexpr uint8_t kCmdReadRx1 = 0x94;  // READ RX BUFFER, start at RXB1SIDH

// Registers.
constexpr uint8_t kRegCanCtrl = 0x0F;
constexpr uint8_t kRegCnf1 = 0x2A;
constexpr uint8_t kRegCnf2 = 0x29;
constexpr uint8_t kRegCnf3 = 0x28;

uint8_t spi_read_register(uint8_t address) {
  digitalWrite(kCsPin, LOW);
  SPI.transfer(kCmdRead);
  SPI.transfer(address);
  const uint8_t value = SPI.transfer(0x00);
  digitalWrite(kCsPin, HIGH);
  return value;
}

void spi_write_register(uint8_t address, uint8_t value) {
  digitalWrite(kCsPin, LOW);
  SPI.transfer(kCmdWrite);
  SPI.transfer(address);
  SPI.transfer(value);
  digitalWrite(kCsPin, HIGH);
}

uint8_t spi_read_status() {
  digitalWrite(kCsPin, LOW);
  SPI.transfer(kCmdReadStatus);
  const uint8_t value = SPI.transfer(0x00);
  digitalWrite(kCsPin, HIGH);
  return value;
}

// Reads one frame from an RX buffer (id + dlc + data) and prints it.
void dump_rx_buffer(uint8_t read_cmd) {
  digitalWrite(kCsPin, LOW);
  SPI.transfer(read_cmd);
  const uint8_t sidh = SPI.transfer(0x00);
  const uint8_t sidl = SPI.transfer(0x00);
  SPI.transfer(0x00);  // EID8, unused for standard ids.
  SPI.transfer(0x00);  // EID0
  const uint8_t dlc = SPI.transfer(0x00) & 0x0F;
  uint8_t data[8];
  for (uint8_t i = 0; i < dlc && i < 8; ++i) {
    data[i] = SPI.transfer(0x00);
  }
  digitalWrite(kCsPin, HIGH);  // Releasing CS clears the RX-full flag.

  const uint16_t can_id =
      (static_cast<uint16_t>(sidh) << 3) | (sidl >> 5);
  Serial.print(can_id, HEX);
  for (uint8_t i = 0; i < dlc && i < 8; ++i) {
    Serial.print(' ');
    if (data[i] < 0x10) {
      Serial.print('0');
    }
    Serial.print(data[i], HEX);
  }
  Serial.println();
}

}  // namespace

void setup() {
  Serial.begin(115200);
  pinMode(kCsPin, OUTPUT);
  digitalWrite(kCsPin, HIGH);
  SPI.begin();
  SPI.beginTransaction(SPISettings(8000000, MSBFIRST, SPI_MODE0));

  digitalWrite(kCsPin, LOW);
  SPI.transfer(kCmdReset);
  digitalWrite(kCsPin, HIGH);
  delay(10);

  // 500 kbps with a 16 MHz crystal: BRP=0, prop 3 Tq, PS1 8 Tq, PS2 4 Tq.
  spi_write_register(kRegCnf1, 0x00);
  spi_write_register(kRegCnf2, 0xBA);
  spi_write_register(kRegCnf3, 0x03);
  // Listen-only mode: never ACK or error-flag the car's bus.
  spi_write_register(kRegCanCtrl, 0x60);
}

void loop() {
  const uint8_t status = spi_read_status();
  if (status & 0x01) {  // RX0IF
    dump_rx_buffer(kCmdReadRx0);
  }
  if (status & 0x02) {  // RX1IF
    dump_rx_buffer(kCmdReadRx1);
  }
}
