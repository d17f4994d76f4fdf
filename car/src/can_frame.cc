#include "pgcar/can_frame.h"

#include <cstdio>

namespace pgcar {

namespace {
int HexDigit(char c) {
  if (c >= '0' && c <= '9') return c - '0';
  if (c >= 'a' && c <= 'f') return c - 'a' + 10;
  if (c >= 'A' && c <= 'F') return c - 'A' + 10;
  return -1;
}
}  // namespace

bool TryParseCanFrame(const std::string &text, CanFrame *frame) {
  if (frame == nullptr || text.empty()) return false;

  // Frame id: hex up to the first space (up to 8 hex chars for 29-bit ids).
  size_t pos = 0;
  uint64_t id = 0;
  size_t id_digits = 0;
  while (pos < text.size() && text[pos] != ' ') {
    const int digit = HexDigit(text[pos]);
    if (digit < 0 || id_digits >= 8) return false;
    id = (id << 4) | static_cast<uint64_t>(digit);
    ++id_digits;
    ++pos;
  }
  if (id_digits == 0) return false;
  frame->id = static_cast<uint32_t>(id);
  frame->length = 0;

  // Payload: " HH" groups; a trailing single space is tolerated.
  while (pos < text.size()) {
    if (text[pos] != ' ') return false;
    const size_t start = pos + 1;
    if (start >= text.size()) break;  // trailing separator
    if (start + 2 > text.size()) return false;
    const int hi = HexDigit(text[start]);
    const int lo = HexDigit(text[start + 1]);
    if (hi < 0 || lo < 0) return false;
    // Each byte must be exactly two hex chars (next char is end or space).
    if (start + 2 < text.size() && text[start + 2] != ' ') return false;
    if (frame->length >= kCanMaxPayload) return false;
    frame->data[frame->length++] = static_cast<uint8_t>((hi << 4) | lo);
    pos = start + 2;
  }
  return true;
}

std::string CanFramePayloadToHex(const CanFrame &frame) {
  std::string out;
  char buf[3];
  for (uint8_t i = 0; i < frame.length; ++i) {
    std::snprintf(buf, sizeof(buf), "%02X", frame.data[i]);
    out += buf;
  }
  return out;
}

namespace kia {

int16_t ParseCanInt16(const uint8_t *bytes) {
  // CAN payloads are little endian; assemble explicitly so the result is
  // host-endianness independent.
  const uint16_t raw =
      static_cast<uint16_t>(bytes[0]) | (static_cast<uint16_t>(bytes[1]) << 8);
  return static_cast<int16_t>(raw);
}

int16_t IntegerAverage(const int16_t *values, size_t count) {
  int16_t result = 0;
  int16_t remainder = 0;
  const auto n = static_cast<int16_t>(count);
  for (size_t i = 0; i < count; ++i) {
    const int16_t quotient = static_cast<int16_t>(values[i] / n);
    result = static_cast<int16_t>(result + quotient);
    remainder = static_cast<int16_t>(
        remainder + (values[i] - static_cast<int16_t>(quotient * n)));
  }
  return static_cast<int16_t>(result + remainder / n);
}

bool ParseSteeringAngle(const CanFrame &frame, SteeringAngle *out) {
  if (out == nullptr || frame.length != kSteeringWheelAnglePayloadSize)
    return false;
  out->angle_deci_degrees = ParseCanInt16(frame.data);
  return true;
}

bool ParseWheelSpeeds(const CanFrame &frame, WheelSpeeds *out) {
  if (out == nullptr || frame.length != kVelocityPayloadSize) return false;
  out->front_left = ParseCanInt16(frame.data);
  out->front_right = ParseCanInt16(frame.data + 2);
  out->rear_left = ParseCanInt16(frame.data + 4);
  out->rear_right = ParseCanInt16(frame.data + 6);
  return true;
}

}  // namespace kia
}  // namespace pgcar
