// End-to-end test of the Arduino serial channel against a FAKE BOARD on the
// master side of an openpty pair: the reset/drain/expect-'\r' handshake and
// the SendCommand echo loop (reference semantics: arduino_comm.cc:79-146).
// The emulator speaks the same incremental KiaControlCommandProcessor
// protocol the firmware runs, so the test exercises the real wire format —
// type char + decimal int16 + '\r', one ack byte per accepted command.

#include "pgcar/arduino_comm.h"

#include <atomic>
#include <thread>
#include <vector>

#include <poll.h>
#include <pty.h>
#include <unistd.h>

#include "pgcar/steering_commands.h"
#include "pgcar/testing.h"

namespace pgcar {
namespace {

// Fast handshake pacing: no real board is booting behind a pty.
ArduinoTimings FastTimings() {
  ArduinoTimings t;
  t.settle_usec = 1000;
  t.drain_usec = 1000;
  return t;
}

// Firmware-equivalent command loop on the pty master: consume bytes through
// the shared KiaControlCommandProcessor, record parsed commands, write one
// ack byte per terminator. `ack_byte` lets tests send a WRONG ack;
// `mute_after` stops acking after N commands (dead-board simulation).
class FakeArduino {
 public:
  FakeArduino(int master_fd, char ack_byte = kia::KiaControlCommandProcessor::kCommandEnd,
              int mute_after = -1)
      : fd_(master_fd), ack_byte_(ack_byte), mute_after_(mute_after),
        thread_([this] { Run(); }) {}

  ~FakeArduino() {
    stop_ = true;  // reader polls with a timeout, so it notices promptly
    thread_.join();
    close(fd_);
  }

  std::vector<kia::KiaControlCommand> commands() {
    std::lock_guard<std::mutex> lock(mutex_);
    return commands_;
  }

 private:
  // Blocking read with a stop_ escape hatch: close() from another thread
  // does NOT unblock a read stuck on a pty master, so the reader must poll.
  bool ReadByte(char *c) {
    while (!stop_) {
      pollfd pfd{fd_, POLLIN, 0};
      const int ready = poll(&pfd, 1, /*timeout_ms=*/20);
      if (ready < 0) return false;
      if (ready == 0) continue;
      return read(fd_, c, 1) == 1;
    }
    return false;
  }

  void Run() {
    kia::KiaControlCommandProcessor processor;
    char c = 0;
    while (!stop_ && ReadByte(&c)) {
      const auto status = processor.ConsumeChar(c);
      if (status == kia::KiaControlCommandProcessor::INCOMPLETE) continue;
      if (status == kia::KiaControlCommandProcessor::READY_OK) {
        kia::KiaControlCommand command;
        processor.GetCurrentCommand(&command);
        int seen = 0;
        {
          std::lock_guard<std::mutex> lock(mutex_);
          commands_.push_back(command);
          seen = static_cast<int>(commands_.size());
        }
        if (mute_after_ < 0 || seen <= mute_after_) {
          if (write(fd_, &ack_byte_, 1) != 1) break;
        }
      }
      processor.startNextCommand();
    }
  }

  int fd_;
  char ack_byte_;
  int mute_after_;
  std::atomic<bool> stop_{false};
  std::mutex mutex_;
  std::vector<kia::KiaControlCommand> commands_;
  std::thread thread_;
};

struct Pty {
  int master = -1;
  int slave = -1;  // kept open: with zero slave fds the master reads EIO
  char name[64] = {0};
  Pty() { openpty(&master, &slave, name, nullptr, nullptr); }
  ~Pty() {
    if (slave >= 0) close(slave);
    // master is owned (and closed) by the FakeArduino built on it.
  }
};

TEST(ArduinoCommTest, HandshakeSucceedsAndCommandsFlow) {
  Pty pty;
  EXPECT_TRUE(pty.master >= 0);
  FakeArduino board(pty.master);

  ArduinoCommandChannel channel(pty.name, FastTimings());
  EXPECT_TRUE(channel.ok());

  kia::KiaControlCommand steer{};
  steer.type = kia::KiaControlCommand::STEER;
  steer.value = -137;
  EXPECT_TRUE(channel.SendCommand(steer));

  kia::KiaControlCommand echo{};
  echo.type = kia::KiaControlCommand::ECHO_COMMAND;
  echo.value = 1;
  EXPECT_TRUE(channel.SendCommand(echo));

  // The board saw: two handshake RESETs, then the two commands, in order
  // and with intact values (wire round trip through ToString/ConsumeChar).
  // The drain flush can leave the ack stream one byte ahead of the parse,
  // so wait for the parse to catch up instead of racing it.
  for (int i = 0; i < 2000 && board.commands().size() < 4; ++i) usleep(1000);
  const auto seen = board.commands();
  EXPECT_EQ(static_cast<int>(seen.size()), 4);
  if (seen.size() == 4) {
    EXPECT_EQ(seen[0].type, kia::KiaControlCommand::RESET);
    EXPECT_EQ(seen[1].type, kia::KiaControlCommand::RESET);
    EXPECT_EQ(seen[2].type, kia::KiaControlCommand::STEER);
    EXPECT_EQ(seen[2].value, -137);
    // ECHO_COMMAND serializes as a bare 'e' (steering_commands.cc
    // ToString) — no value travels on the wire.
    EXPECT_EQ(seen[3].type, kia::KiaControlCommand::ECHO_COMMAND);
  }
}

TEST(ArduinoCommTest, HandshakeFailsOnWrongAckByte) {
  Pty pty;
  EXPECT_TRUE(pty.master >= 0);
  FakeArduino board(pty.master, /*ack_byte=*/'x');

  ArduinoCommandChannel channel(pty.name, FastTimings());
  EXPECT_TRUE(!channel.ok());

  // A failed handshake latches the channel shut: sends are refused without
  // touching the wire (reference: SendCommand checks handshake state).
  kia::KiaControlCommand steer{};
  steer.type = kia::KiaControlCommand::STEER;
  steer.value = 5;
  EXPECT_TRUE(!channel.SendCommand(steer));
  EXPECT_EQ(static_cast<int>(board.commands().size()), 2);
}

TEST(ArduinoCommTest, HandshakeFailsWhenBoardGoesSilent) {
  Pty pty;
  EXPECT_TRUE(pty.master >= 0);
  // Board dies after acking the first RESET: the drain discards that ack,
  // and the second RESET's blocking 1-byte read must fail on EOF rather
  // than hang (the fake closes its fd when destroyed — here we mute, then
  // rely on the channel's read returning 0 once the test closes the
  // master). To avoid a hang we run the channel open in a thread and close
  // the master once both RESETs arrived.
  FakeArduino *board = new FakeArduino(pty.master, /*ack=*/'\r',
                                       /*mute_after=*/1);
  std::atomic<bool> channel_ok{true};
  std::thread opener([&] {
    ArduinoCommandChannel channel(pty.name, FastTimings());
    channel_ok = channel.ok();
  });
  // Wait for the board to have seen both RESETs, then cut the line.
  for (int i = 0; i < 2000 && board->commands().size() < 2; ++i) {
    usleep(1000);
  }
  EXPECT_EQ(static_cast<int>(board->commands().size()), 2);
  delete board;  // closes the master -> channel's ack read sees EOF
  opener.join();
  EXPECT_TRUE(!channel_ok.load());
}

TEST(ArduinoCommTest, OpenFailureReportsNotOk) {
  ArduinoCommandChannel channel("/nonexistent/tty", FastTimings());
  EXPECT_TRUE(!channel.ok());
}

}  // namespace
}  // namespace pgcar

PGTEST_MAIN()
