// Host/firmware-shared serial control protocol for the steering spoof box.
//
// Wire format (reference: sketches/libs/spoof-steering-serial-commands/
// spoof-steering-serial-commands.h): a command is a type character
// ('s' = set steering torque offset, 'e' = echo voltages, 'r' = reset),
// optionally followed by a decimal int16 value, terminated by '\r'. The
// incremental processor consumes one serial character at a time and reports
// INCOMPLETE / READY_OK / PARSE_FAIL / COMMAND_OVERFLOW.
//
// This header is compiled both into the host car stack and the Arduino
// firmware (no STL, no dynamic allocation).
#ifndef PGCAR_STEERING_COMMANDS_H_
#define PGCAR_STEERING_COMMANDS_H_

#include <stdint.h>

namespace pgcar {
namespace kia {

struct KiaControlCommand {
  static constexpr char STEER = 's';
  static constexpr char ECHO_COMMAND = 'e';
  static constexpr char RESET = 'r';

  // Parses a null-terminated string; on failure the command may be left in
  // a partially-written state.
  static bool TryParse(const char *str, KiaControlCommand *command);

  // Serializes to str (null-terminated); false if the buffer is too small.
  bool ToString(char *str, int str_size) const;

  char type = 0;
  int16_t value = 0;
};

constexpr char kVoltageReportTag = 'v';

class KiaControlCommandProcessor {
 public:
  static constexpr char kCommandEnd = '\r';
  enum CommandStatus {
    INCOMPLETE,        // consuming characters, no terminator yet
    READY_OK,          // terminator seen, command parsed successfully
    PARSE_FAIL,        // terminator seen, text is not a valid command
    COMMAND_OVERFLOW,  // terminator seen, text did not fit the buffer
  };

  CommandStatus GetCommandStatus() const { return status_; }

  // Valid only in READY_OK (right after the terminator of a good command).
  bool GetCurrentCommand(KiaControlCommand *command) const;

  // Acknowledge the previous parse outcome and reset for the next command.
  // No-op (returns false) while a command is still being received.
  bool startNextCommand();

  CommandStatus ConsumeChar(char next_char);

 private:
  CommandStatus ParseBuffer();

  static constexpr uint16_t kMaxCommandLength = 16;
  char buffer_[kMaxCommandLength];
  uint16_t consumed_ = 0;
  KiaControlCommand command_;
  CommandStatus status_ = INCOMPLETE;
};

// Parses a bounded (non-null-terminated) command string.
bool ParseSingleKiaControlCommand(const char *text, uint16_t length,
                                  KiaControlCommand *result);

}  // namespace kia
}  // namespace pgcar

#endif  // PGCAR_STEERING_COMMANDS_H_
