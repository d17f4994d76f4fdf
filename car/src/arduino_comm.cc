#include "pgcar/arduino_comm.h"

#include <cstring>

#include <fcntl.h>
#include <termios.h>
#include <unistd.h>

namespace pgcar {

OpenedTty::OpenedTty(const std::string &tty_name, int baud_rate) {
  fd_ = open(tty_name.c_str(), O_RDWR | O_NOCTTY);
  if (fd_ < 0) return;

  termios tio;
  std::memset(&tio, 0, sizeof(tio));
  if (tcgetattr(fd_, &tio) != 0) {
    close(fd_);
    fd_ = -1;
    return;
  }
  cfmakeraw(&tio);
  // Keep DTR asserted across close so the Arduino does not auto-reset every
  // time the channel reopens.
  tio.c_cflag &= ~static_cast<tcflag_t>(HUPCL);
  tio.c_cflag |= CLOCAL | CREAD;
  tio.c_cc[VMIN] = 1;   // blocking single-byte reads
  tio.c_cc[VTIME] = 0;
  const speed_t speed = baud_rate == 115200 ? B115200 : B9600;
  cfsetispeed(&tio, speed);
  cfsetospeed(&tio, speed);
  if (tcsetattr(fd_, TCSANOW, &tio) != 0) {
    close(fd_);
    fd_ = -1;
  }
}

OpenedTty::~OpenedTty() {
  if (fd_ >= 0) close(fd_);
}

ArduinoCommandChannel::ArduinoCommandChannel(const std::string &tty_name,
                                             ArduinoTimings timings)
    : timings_(timings), tty_(tty_name) {
  if (tty_.ok()) handshake_ok_ = Handshake();
}

bool ArduinoCommandChannel::Handshake() {
  // Give a freshly-reset board time to boot.
  usleep(timings_.settle_usec);

  char reset_text[4];
  kia::KiaControlCommand reset{};
  reset.type = kia::KiaControlCommand::RESET;
  if (!reset.ToString(reset_text, sizeof(reset_text))) return false;

  // First RESET flushes whatever state the board and the line are in.
  if (write(tty_.fd(), reset_text, std::strlen(reset_text)) < 0) return false;
  const char end = kia::KiaControlCommandProcessor::kCommandEnd;
  if (write(tty_.fd(), &end, 1) != 1) return false;
  usleep(timings_.drain_usec);
  tcflush(tty_.fd(), TCIFLUSH);

  // Second RESET must be acknowledged with the terminator byte.
  if (write(tty_.fd(), reset_text, std::strlen(reset_text)) < 0) return false;
  if (write(tty_.fd(), &end, 1) != 1) return false;
  char ack = 0;
  if (read(tty_.fd(), &ack, 1) != 1) return false;
  return ack == end;
}

bool ArduinoCommandChannel::SendCommand(const kia::KiaControlCommand &command) {
  if (!handshake_ok_) return false;
  // Latest-wins: if another send is in flight, drop this one instead of
  // queuing stale torque values.
  std::unique_lock<std::mutex> lock(send_mutex_, std::try_to_lock);
  if (!lock.owns_lock()) return false;

  char text[16];
  if (!command.ToString(text, sizeof(text) - 1)) return false;
  const size_t length = std::strlen(text);
  text[length] = kia::KiaControlCommandProcessor::kCommandEnd;
  if (write(tty_.fd(), text, length + 1) !=
      static_cast<ssize_t>(length + 1)) {
    return false;
  }
  char ack = 0;
  return read(tty_.fd(), &ack, 1) == 1 &&
         ack == kia::KiaControlCommandProcessor::kCommandEnd;
}

}  // namespace pgcar
