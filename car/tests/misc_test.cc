// Tests for the CAN frame codecs, ring history, voltage smoothing, JSON
// logger and prediction-message parsing.
#include <cstdio>
#include <fstream>
#include <sstream>
#include <thread>

#include "pgcar/can_frame.h"
#include "pgcar/can_socket.h"
#include "pgcar/json_logger.h"
#include "pgcar/nn_comm.h"
#include "pgcar/testing.h"
#include "pgcar/timestamped_history.h"
#include "pgcar/torque_ramp.h"
#include "pgcar/voltage_smoothing.h"

using pgcar::CanFrame;
using pgcar::MakeCanFilter;
using pgcar::Timestamped;
using pgcar::TimestampedHistory;
using pgcar::TryParseCanFrame;

TEST(CanFrameText, ParsesIdAndPayload) {
  CanFrame frame;
  EXPECT_TRUE(TryParseCanFrame("2B0 01 FE 03", &frame));
  EXPECT_EQ(frame.id, 0x2B0u);
  EXPECT_EQ(frame.length, 3);
  EXPECT_EQ(frame.data[0], 0x01);
  EXPECT_EQ(frame.data[1], 0xFE);
  EXPECT_EQ(frame.data[2], 0x03);
  EXPECT_TRUE(pgcar::CanFramePayloadToHex(frame) == "01FE03");
}

TEST(CanFrameText, TrailingSeparatorTolerated) {
  CanFrame frame;
  EXPECT_TRUE(TryParseCanFrame("4B0 01 02 ", &frame));
  EXPECT_EQ(frame.length, 2);
}

TEST(CanFrameText, RejectsMalformed) {
  CanFrame frame;
  EXPECT_FALSE(TryParseCanFrame("", &frame));
  EXPECT_FALSE(TryParseCanFrame("xyz 01", &frame));
  EXPECT_FALSE(TryParseCanFrame("2B0  01", &frame));  // double separator
  EXPECT_FALSE(TryParseCanFrame("2B0 1", &frame));    // odd byte length
  EXPECT_FALSE(TryParseCanFrame("2B0 123", &frame));  // 3-char byte
  EXPECT_FALSE(
      TryParseCanFrame("2B0 01 02 03 04 05 06 07 08 09", &frame));  // > 8
}

TEST(KiaParsers, SteeringAngleAndSpeeds) {
  CanFrame frame;
  EXPECT_TRUE(TryParseCanFrame("2B0 64 00 00 00 00", &frame));
  pgcar::kia::SteeringAngle angle;
  EXPECT_TRUE(pgcar::kia::ParseSteeringAngle(frame, &angle));
  EXPECT_NEAR(angle.degrees(), 10.0, 1e-12);

  // Negative deci-degrees (0xFF9C = -100).
  EXPECT_TRUE(TryParseCanFrame("2B0 9C FF 00 00 00", &frame));
  EXPECT_TRUE(pgcar::kia::ParseSteeringAngle(frame, &angle));
  EXPECT_NEAR(angle.degrees(), -10.0, 1e-12);

  // Wrong payload size rejected.
  EXPECT_TRUE(TryParseCanFrame("2B0 64 00", &frame));
  EXPECT_FALSE(pgcar::kia::ParseSteeringAngle(frame, &angle));

  EXPECT_TRUE(TryParseCanFrame("4B0 0A 00 0C 00 0E 00 10 00", &frame));
  pgcar::kia::WheelSpeeds speeds;
  EXPECT_TRUE(pgcar::kia::ParseWheelSpeeds(frame, &speeds));
  EXPECT_EQ(speeds.front_left, 10);
  EXPECT_EQ(speeds.rear_right, 16);
  EXPECT_EQ(speeds.average(), 13);
}

TEST(CanFilter, MaskCoversAcceptedIds) {
  const auto filter = MakeCanFilter({0x2B0, 0x4B0});
  // Both accepted ids must pass the id/mask test.
  EXPECT_EQ(0x2B0u & filter.mask, filter.id & filter.mask);
  EXPECT_EQ(0x4B0u & filter.mask, filter.id & filter.mask);
  // An id differing in a bit the accepted ids share must be rejected
  // (bits that differ between accepted ids are masked out, so the combined
  // filter may pass extra ids -- e.g. 0x0B0 -- by design).
  EXPECT_NE(0x2B1u & filter.mask, filter.id & filter.mask);
  EXPECT_NE(0x330u & filter.mask, filter.id & filter.mask);
}

TEST(History, RingKeepsLatestAndOrdering) {
  TimestampedHistory<int> history(3);
  Timestamped<int> latest;
  EXPECT_FALSE(history.get_latest(&latest));
  for (int i = 0; i < 5; ++i) history.update(i, {i, 0});
  EXPECT_TRUE(history.get_latest(&latest));
  EXPECT_EQ(latest.data(), 4);
  const auto all = history.history();
  EXPECT_EQ(all.size(), 3u);
  EXPECT_EQ(all.front().data(), 2);
  EXPECT_EQ(all.back().data(), 4);
}

TEST(History, WaitGetNextTimesOutAndWakes) {
  TimestampedHistory<int> history(2);
  Timestamped<int> out;
  const timeval short_timeout = {0, 20000};
  EXPECT_FALSE(history.wait_get_next({0, 0}, &short_timeout, &out));

  std::thread producer([&history]() {
    usleep(30000);
    history.update(7, {42, 0});
  });
  const timeval long_timeout = {1, 0};
  EXPECT_TRUE(history.wait_get_next({0, 0}, &long_timeout, &out));
  EXPECT_EQ(out.data(), 7);
  producer.join();

  // Same timestamp as the latest entry: nothing new -> timeout.
  EXPECT_FALSE(history.wait_get_next(out.timestamp(), &short_timeout, &out));
}

TEST(VoltageSmoothing, RunningAverageOverPowerOfTwo) {
  pgcar::kia::HistoricVoltageData<2> data;  // 4-sample window
  for (uint16_t v : {100, 104, 96, 100}) data.take_measurement({v, v});
  EXPECT_EQ(data.avg_green(), 100);
  EXPECT_EQ(data.latest_green(), 100);
  // Window slides: replacing the oldest (100) with 200 -> (104+96+100+200)/4.
  data.take_measurement({200, 200});
  EXPECT_EQ(data.avg_green(), 125);
  EXPECT_EQ(data.buffer_size(), 4u);
}

TEST(VoltageSmoothing, HysteresisSuppressesJitter) {
  using pgcar::kia::HysteresisOutput;
  EXPECT_EQ(HysteresisOutput(128, 129, 1), 128);  // within threshold: hold
  EXPECT_EQ(HysteresisOutput(128, 127, 1), 128);
  EXPECT_EQ(HysteresisOutput(128, 130, 1), 130);  // beyond threshold: move
  EXPECT_EQ(HysteresisOutput(128, 126, 1), 126);
}

TEST(PredictionJson, ParsesSteeringMessages) {
  double degrees = 0;
  EXPECT_TRUE(pgcar::ParseSteeringPredictionJson("{\"s\": -12.5}", &degrees));
  EXPECT_NEAR(degrees, -12.5, 1e-12);
  EXPECT_TRUE(pgcar::ParseSteeringPredictionJson("{\"s\":3}", &degrees));
  EXPECT_NEAR(degrees, 3.0, 1e-12);
  EXPECT_FALSE(pgcar::ParseSteeringPredictionJson("{\"x\": 1}", &degrees));
  EXPECT_FALSE(pgcar::ParseSteeringPredictionJson("{\"s\": }", &degrees));
}

TEST(JsonLogger, WritesValidIncrementalJson) {
  TimestampedHistory<double> history(8);
  const char *path = "/tmp/pgcar_logger_test.json";
  {
    pgcar::TimestampedJsonLogger<double> logger(
        path, "angles",
        [](const double &v, std::ostream &out) { out << "\"value\": " << v; },
        &history, 5000);
    history.update(1.5, {10, 0});
    usleep(20000);
    history.update(-2.5, {11, 0});
    usleep(20000);
    logger.Stop();
  }
  std::ifstream in(path);
  std::stringstream content;
  content << in.rdbuf();
  const std::string text = content.str();
  EXPECT_TRUE(text.find("\"angles\": [") != std::string::npos);
  EXPECT_TRUE(text.find("\"time_usec\": 10000000") != std::string::npos);
  EXPECT_TRUE(text.find("\"value\": 1.5") != std::string::npos);
  EXPECT_TRUE(text.find("\"value\": -2.5") != std::string::npos);
  // Valid JSON framing: closes the array and the object.
  EXPECT_TRUE(text.find("]\n}") != std::string::npos);
  std::remove(path);
}

TEST(TorqueRamp, StaircasesToTargetHoldsThenDecays) {
  pgcar::kia::SteeringSpoofSettings settings;
  settings.max_steering_magnitude = 3;
  settings.steps_per_adjustment_level = 2;
  settings.steps_at_target_level = 4;
  settings.voltage_update_hysteresis = 1;
  pgcar::kia::TorqueRamp ramp(settings, 8, 8);
  ramp.update_measurements({100, 100});

  ramp.set_target_offset(3);
  // One LSB per 2 steps: 0 -> 1 -> 2 -> 3 over 6 steps.
  int16_t trace[16];
  for (int i = 0; i < 16; ++i) {
    ramp.step();
    trace[i] = ramp.current_offset();
  }
  EXPECT_EQ(trace[1], 1);
  EXPECT_EQ(trace[3], 2);
  EXPECT_EQ(trace[5], 3);
  // Holds at 3 for steps_at_target_level + steps_per_adjustment_level
  // cycles, then auto-decays toward 0.
  EXPECT_EQ(trace[10], 3);
  EXPECT_EQ(trace[12], 2);
  EXPECT_EQ(ramp.target_offset() <= 3, true);

  // Differential outputs while the offset is nonzero: green +, blue -.
  pgcar::kia::TorqueRamp fresh(settings, 8, 8);
  fresh.update_measurements({100, 100});
  fresh.set_target_offset(2);
  for (int i = 0; i < 4; ++i) fresh.step();
  EXPECT_EQ(fresh.current_offset(), 2);
  EXPECT_EQ(fresh.out_green_dac(), 102);
  EXPECT_EQ(fresh.out_blue_dac(), 98);
}

TEST(TorqueRamp, ClampsAndConvertsResolution) {
  pgcar::kia::SteeringSpoofSettings settings;
  settings.max_steering_magnitude = 5;
  settings.steps_per_adjustment_level = 1;
  settings.steps_at_target_level = 100;
  pgcar::kia::TorqueRamp ramp(settings, /*adc_bits=*/10, /*dac_bits=*/12);
  // 10-bit ADC 512 -> 12-bit DAC 2048 passthrough.
  ramp.update_measurements({512, 512});
  EXPECT_EQ(ramp.out_green_dac(), 2048);
  // Commanded offset beyond the envelope clamps to +/-5.
  ramp.set_target_offset(1000);
  EXPECT_EQ(ramp.target_offset(), 5);
  ramp.set_target_offset(-1000);
  EXPECT_EQ(ramp.target_offset(), -5);
}

TEST(TorqueRamp, FixedTorqueCharCommands) {
  pgcar::kia::SteeringSpoofSettings settings;
  settings.max_steering_magnitude = 5;
  settings.steps_per_adjustment_level = 1;
  settings.steps_at_target_level = 400;
  pgcar::kia::TorqueRamp ramp(settings, 8, 8);
  // 'l' -> full left magnitude, 'r' -> full right, junk ignored
  // (reference steering-fixed-torque.ino: latest-wins single chars).
  EXPECT_TRUE(pgcar::kia::ApplyFixedTorqueChar('l', &ramp, settings));
  EXPECT_EQ(ramp.target_offset(), 5);
  EXPECT_TRUE(pgcar::kia::ApplyFixedTorqueChar('r', &ramp, settings));
  EXPECT_EQ(ramp.target_offset(), -5);
  EXPECT_FALSE(pgcar::kia::ApplyFixedTorqueChar('x', &ramp, settings));
  EXPECT_EQ(ramp.target_offset(), -5);
}

TEST(TorqueRamp, FlexTorqueCommandProtocol) {
  pgcar::kia::SteeringSpoofSettings settings;
  settings.max_steering_magnitude = 300;
  settings.steps_per_adjustment_level = 2;
  settings.steps_at_target_level = 300;
  pgcar::kia::TorqueRamp ramp(settings, 10, 12);
  bool echo = false;

  pgcar::kia::KiaControlCommand cmd;
  cmd.type = pgcar::kia::KiaControlCommand::STEER;
  cmd.value = -120;
  EXPECT_TRUE(pgcar::kia::ApplyFlexTorqueCommand(cmd, &ramp, &echo));
  EXPECT_EQ(ramp.target_offset(), -120);

  cmd.type = pgcar::kia::KiaControlCommand::ECHO_COMMAND;
  cmd.value = 1;
  EXPECT_TRUE(pgcar::kia::ApplyFlexTorqueCommand(cmd, &ramp, &echo));
  EXPECT_TRUE(echo);

  cmd.type = pgcar::kia::KiaControlCommand::RESET;
  EXPECT_TRUE(pgcar::kia::ApplyFlexTorqueCommand(cmd, &ramp, &echo));
  EXPECT_EQ(ramp.target_offset(), 0);
  EXPECT_FALSE(echo);

  cmd.type = 'z';
  EXPECT_FALSE(pgcar::kia::ApplyFlexTorqueCommand(cmd, &ramp, &echo));
}

PGTEST_MAIN()
