// Manual steer-by-wire control console.
//
// Replaces the reference's Qt manual-control window
// (src/kia_steering_ui.cc + src/ui_steering_manual/) with a stdin-driven
// console for headless use; same wiring: CAN updater -> controller ->
// Arduino channel, with JSON drive logs.
//
// Commands on stdin:  a <degrees>  set target angle
//                     c            clear target
//                     q            quit
// Usage: kia_steering_manual --can_interface=can0 --arduino_tty=/dev/ttyUSB0
//        [--kia_log_dir=DIR]
#include <cstdio>
#include <cstring>
#include <iostream>
#include <memory>
#include <sstream>
#include <string>

#include "pgcar/arduino_comm.h"
#include "pgcar/json_logger.h"
#include "pgcar/kia_can.h"
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
  const std::string log_dir = FlagValue(argc, argv, "kia_log_dir", "");
  if (can_interface.empty() || arduino_tty.empty()) {
    std::fprintf(
        stderr,
        "usage: %s --can_interface=can0 --arduino_tty=/dev/ttyUSB0\n",
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

  pgcar::kia::SteeringAngleHolderController controller(
      &car_data.steering_angles(), &arduino);

  std::unique_ptr<pgcar::TimestampedJsonLogger<pgcar::kia::SteeringAngle>>
      angle_logger;
  std::unique_ptr<
      pgcar::TimestampedJsonLogger<pgcar::kia::TargetSteeringAngleStatus>>
      target_logger;
  if (!log_dir.empty()) {
    angle_logger = std::make_unique<
        pgcar::TimestampedJsonLogger<pgcar::kia::SteeringAngle>>(
        log_dir + "/steering_angles.json", "steering_angles",
        [](const pgcar::kia::SteeringAngle &a, std::ostream &out) {
          out << "\"degrees\": " << a.degrees();
        },
        &car_data.steering_angles());
    target_logger = std::make_unique<
        pgcar::TimestampedJsonLogger<pgcar::kia::TargetSteeringAngleStatus>>(
        log_dir + "/target_angles.json", "target_angles",
        [](const pgcar::kia::TargetSteeringAngleStatus &t, std::ostream &out) {
          out << "\"is_set\": " << (t.is_set ? "true" : "false")
              << ", \"degrees\": " << t.angle_degrees;
        },
        &controller.TargetSteeringAnglesHistory());
  }

  can_updater.start();
  std::printf("commands: a <degrees> | c | q\n");
  std::string line;
  while (std::getline(std::cin, line)) {
    std::istringstream parts(line);
    std::string op;
    parts >> op;
    if (op == "q") break;
    if (op == "c") {
      controller.ClearTargetAngle();
      std::printf("target cleared\n");
    } else if (op == "a") {
      double degrees = 0;
      if (parts >> degrees) {
        std::printf(controller.SetTargetAngle(degrees)
                        ? "target set to %.1f\n"
                        : "target %.1f rejected (out of range)\n",
                    degrees);
      }
    }
  }

  controller.Stop();
  can_updater.stop();
  return 0;
}
