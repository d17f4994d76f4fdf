// NN-driven steer-by-wire daemon.
//
// Replaces the reference's Qt NN window (src/kia_steering_nn.cc +
// src/ui_steering_nn/) with a headless daemon; identical dataflow:
// predict_live's ZMQ PUB {"s": degrees} -> conflated SUB ->
// SteeringAngleHolderFeeder -> controller -> Arduino, with JSON drive logs.
//
// Usage: kia_steering_nn --can_interface=can0 --arduino_tty=/dev/ttyUSB0
//        [--steering_prediction_socket=ipc:///tmp/steering-predict]
//        [--kia_log_dir=DIR] [--duration_sec=N]
#include <cstdio>
#include <cstring>
#include <memory>
#include <string>

#include <unistd.h>

#include "pgcar/arduino_comm.h"
#include "pgcar/json_logger.h"
#include "pgcar/kia_can.h"
#include "pgcar/nn_comm.h"
#include "pgcar/steering_angle_holder.h"

namespace {
std::string FlagValue(int argc, char **argv, const std::string &name,
                      const std::string &fallback) {
  const std::string prefix = "--" + name + "=";
  for (int i = 1; i < argc; ++i) {
    if (std::strncmp(argv[i], prefix.c_str(), prefix.size()) == 0) {
      return std::string(argv[i] + prefix.size());
    }
  }
  return fallback;
}
}  // namespace

int main(int argc, char **argv) {
  const std::string can_interface = FlagValue(argc, argv, "can_interface", "");
  const std::string arduino_tty = FlagValue(argc, argv, "arduino_tty", "");
  const std::string socket_address = FlagValue(
      argc, argv, "steering_prediction_socket", "ipc:///tmp/steering-predict");
  const std::string log_dir = FlagValue(argc, argv, "kia_log_dir", "");
  const int duration_sec =
      std::stoi(FlagValue(argc, argv, "duration_sec", "0"));
  if (can_interface.empty() || arduino_tty.empty()) {
    std::fprintf(
        stderr,
        "usage: %s --can_interface=can0 --arduino_tty=/dev/ttyUSB0 "
        "[--steering_prediction_socket=ipc://...]\n",
        argv[0]);
    return 1;
  }

  pgcar::kia::CarMotionData car_data(16);
  pgcar::kia::CarMotionDataUpdater can_updater(
      &car_data, can_interface,
      {pgcar::kia::kSteeringWheelAngleCanId, pgcar::kia::kVelocityCanId},
      {1, 0});
  if (!can_updater.ok()) {
    std::fprintf(stderr, "cannot open CAN interface %s\n",
                 can_interface.c_str());
    return 1;
  }
  pgcar::ArduinoCommandChannel arduino(arduino_tty);
  if (!arduino.ok()) {
    std::fprintf(stderr, "Arduino handshake failed on %s\n",
                 arduino_tty.c_str());
    return 1;
  }

  pgcar::SingleSteeringAnglePredictionUpdater predictions(socket_address, 8);
  if (!predictions.ok()) {
    std::fprintf(stderr, "cannot connect prediction socket %s\n",
                 socket_address.c_str());
    return 1;
  }

  pgcar::kia::SteeringAngleHolderController controller(
      &car_data.steering_angles(), &arduino);
  pgcar::kia::SteeringAngleHolderFeeder feeder(
      &controller, &predictions.predictions(), true /* clip target angle */);

  std::unique_ptr<pgcar::TimestampedJsonLogger<pgcar::kia::SteeringAngle>>
      angle_logger;
  if (!log_dir.empty()) {
    angle_logger = std::make_unique<
        pgcar::TimestampedJsonLogger<pgcar::kia::SteeringAngle>>(
        log_dir + "/steering_angles.json", "steering_angles",
        [](const pgcar::kia::SteeringAngle &a, std::ostream &out) {
          out << "\"degrees\": " << a.degrees();
        },
        &car_data.steering_angles());
  }

  can_updater.start();
  predictions.start();
  feeder.Start();
  std::printf("NN steering active (socket %s)\n", socket_address.c_str());

  if (duration_sec > 0) {
    sleep(duration_sec);
  } else {
    pause();  // run until signaled
  }

  feeder.Stop();
  predictions.stop();
  controller.Stop();
  can_updater.stop();
  return 0;
}
