// USB serial channel to the steering spoof Arduino.
//
// Mirrors ArduinoCommandChannel (src/car/arduino_comm.cc): a 115200-baud raw
// termios TTY with HUPCL cleared (so reopening does not reset the board), a
// startup handshake (settle, RESET, drain, RESET expecting a '\r' ack), and
// a locked send-command-await-ack cycle.
#ifndef PGCAR_ARDUINO_COMM_H_
#define PGCAR_ARDUINO_COMM_H_

#include <mutex>
#include <string>

#include "pgcar/steering_angle_holder.h"
#include "pgcar/steering_commands.h"

namespace pgcar {

class OpenedTty {
 public:
  explicit OpenedTty(const std::string &tty_name, int baud_rate = 115200);
  ~OpenedTty();

  int fd() const { return fd_; }
  bool ok() const { return fd_ >= 0; }

 private:
  int fd_ = -1;
};

// Handshake pacing. Defaults mirror the reference (arduino_comm.cc:79-114):
// 2 s boot settle after open, 200 ms drain pause between the two RESETs.
// Tests drive a fake TTY (openpty) where no board is booting, so they dial
// these down instead of paying real seconds per case.
struct ArduinoTimings {
  int settle_usec = 2 * 1000 * 1000;
  int drain_usec = 200 * 1000;
};

class ArduinoCommandChannel : public kia::CommandSink {
 public:
  explicit ArduinoCommandChannel(const std::string &tty_name,
                                 ArduinoTimings timings = {});

  bool ok() const { return handshake_ok_; }

  // Serializes the command, appends '\r', writes it out and blocks for the
  // 1-byte acknowledgement. Uses try-lock: concurrent senders are dropped
  // rather than queued (latest-state-wins, like the reference).
  bool SendCommand(const kia::KiaControlCommand &command) override;

 private:
  bool Handshake();

  ArduinoTimings timings_;
  OpenedTty tty_;
  std::mutex send_mutex_;
  bool handshake_ok_ = false;
};

}  // namespace pgcar

#endif  // PGCAR_ARDUINO_COMM_H_
