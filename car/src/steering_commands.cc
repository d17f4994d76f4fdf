#include "pgcar/steering_commands.h"

namespace pgcar {
namespace kia {

namespace {

// Freestanding-friendly (no STL/sprintf) decimal int16 parse/format so the
// same code runs on the Arduino.
bool ParseInt16Decimal(const char *text, uint16_t length, int16_t *out) {
  if (length == 0) return false;
  uint16_t pos = 0;
  bool negative = false;
  if (text[0] == '-') {
    negative = true;
    pos = 1;
    if (length == 1) return false;
  }
  int32_t value = 0;
  for (; pos < length; ++pos) {
    if (text[pos] < '0' || text[pos] > '9') return false;
    value = value * 10 + (text[pos] - '0');
    if (value > 32768) return false;
  }
  if (negative) value = -value;
  if (value > 32767 || value < -32768) return false;
  *out = static_cast<int16_t>(value);
  return true;
}

int FormatInt16Decimal(int16_t value, char *out, int out_size) {
  // Returns the number of characters written (no terminator), or -1.
  char tmp[8];
  int len = 0;
  uint16_t magnitude =
      value < 0 ? static_cast<uint16_t>(-(static_cast<int32_t>(value)))
                : static_cast<uint16_t>(value);
  do {
    tmp[len++] = static_cast<char>('0' + magnitude % 10);
    magnitude /= 10;
  } while (magnitude > 0);
  const int total = len + (value < 0 ? 1 : 0);
  if (total >= out_size) return -1;
  int pos = 0;
  if (value < 0) out[pos++] = '-';
  while (len > 0) out[pos++] = tmp[--len];
  return pos;
}

}  // namespace

bool KiaControlCommand::TryParse(const char *str, KiaControlCommand *command) {
  if (str == nullptr || command == nullptr || str[0] == 0) return false;
  uint16_t length = 0;
  while (str[length] != 0) ++length;
  return ParseSingleKiaControlCommand(str, length, command);
}

bool KiaControlCommand::ToString(char *str, int str_size) const {
  if (str == nullptr || str_size < 2) return false;
  switch (type) {
    case STEER: {
      str[0] = type;
      const int written = FormatInt16Decimal(value, str + 1, str_size - 2);
      if (written < 0) return false;
      str[1 + written] = 0;
      return true;
    }
    case ECHO_COMMAND:
    case RESET:
      str[0] = type;
      str[1] = 0;
      return true;
    default:
      return false;
  }
}

bool ParseSingleKiaControlCommand(const char *text, uint16_t length,
                                  KiaControlCommand *result) {
  if (text == nullptr || result == nullptr || length == 0) return false;
  result->type = text[0];
  switch (text[0]) {
    case KiaControlCommand::STEER:
      // Requires a value.
      return ParseInt16Decimal(text + 1, length - 1, &result->value);
    case KiaControlCommand::ECHO_COMMAND:
    case KiaControlCommand::RESET:
      // No-value commands; trailing characters are invalid.
      result->value = 0;
      return length == 1;
    default:
      return false;
  }
}

bool KiaControlCommandProcessor::GetCurrentCommand(
    KiaControlCommand *command) const {
  if (command == nullptr || status_ != READY_OK) return false;
  *command = command_;
  return true;
}

bool KiaControlCommandProcessor::startNextCommand() {
  if (status_ == INCOMPLETE && consumed_ > 0) return false;
  consumed_ = 0;
  status_ = INCOMPLETE;
  return true;
}

KiaControlCommandProcessor::CommandStatus
KiaControlCommandProcessor::ConsumeChar(char next_char) {
  // A new character after a completed parse implicitly starts the next
  // command.
  if (status_ != INCOMPLETE) {
    consumed_ = 0;
    status_ = INCOMPLETE;
  }
  if (next_char == kCommandEnd) {
    status_ = ParseBuffer();
    return status_;
  }
  if (consumed_ >= kMaxCommandLength) {
    // Keep consuming (and discarding) until the terminator; report overflow
    // only when the command ends.
    consumed_ = kMaxCommandLength + 1;
    return status_;
  }
  buffer_[consumed_++] = next_char;
  return status_;
}

KiaControlCommandProcessor::CommandStatus
KiaControlCommandProcessor::ParseBuffer() {
  if (consumed_ > kMaxCommandLength) return COMMAND_OVERFLOW;
  return ParseSingleKiaControlCommand(buffer_, consumed_, &command_)
             ? READY_OK
             : PARSE_FAIL;
}

}  // namespace kia
}  // namespace pgcar
