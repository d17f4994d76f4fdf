// Console CAN steering-angle monitor: prints decoded angles for a fixed
// duration (reference: src/kia_steering_angle.cc). Usage:
//   kia_steering_angle --can_interface=can0 [--duration_sec=20]
#include <cstdio>
#include <cstring>
#include <string>

#include "pgcar/kia_can.h"
#include "pgcar/timestamped_history.h"

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
  const std::string interface = FlagValue(argc, argv, "can_interface", "");
  const int duration_sec =
      std::stoi(FlagValue(argc, argv, "duration_sec", "20"));
  if (interface.empty()) {
    std::fprintf(stderr, "usage: %s --can_interface=can0 [--duration_sec=N]\n",
                 argv[0]);
    return 1;
  }

  pgcar::kia::CarMotionData data(16);
  pgcar::kia::CarMotionDataUpdater updater(
      &data, interface,
      {pgcar::kia::kSteeringWheelAngleCanId, pgcar::kia::kVelocityCanId},
      {1, 0});
  if (!updater.ok()) {
    std::fprintf(stderr, "cannot open CAN interface %s\n", interface.c_str());
    return 1;
  }
  updater.start();

  pgcar::Timestamped<pgcar::kia::SteeringAngle> angle = {{}, {0, 0}};
  const timeval deadline_step = {1, 0};
  for (int elapsed = 0; elapsed < duration_sec;) {
    if (data.steering_angles().wait_get_next(angle.timestamp(), &deadline_step,
                                             &angle)) {
      std::printf("steering angle: %.1f degrees\n", angle.data().degrees());
    } else {
      ++elapsed;
    }
  }
  updater.stop();
  return 0;
}
