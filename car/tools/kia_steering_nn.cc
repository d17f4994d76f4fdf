// NN-driven steer-by-wire daemon + HTTP operator panel.
//
// Replaces the reference's Qt NN window (src/kia_steering_nn.cc +
// src/ui_steering_nn/steering_nn_main_window.cpp) for headless use;
// identical dataflow: predict_live's ZMQ PUB {"s": degrees} -> conflated
// SUB -> SteeringAngleHolderFeeder -> controller -> Arduino, with JSON
// drive logs. --panel_port=N serves the Qt window's live labels (measured
// angle, latest NN prediction, target) and its enable/disable steering
// buttons over HTTP (pgcar/http_panel.h).
//
// Usage: kia_steering_nn --can_interface=can0 --arduino_tty=/dev/ttyUSB0
//        [--steering_prediction_socket=ipc:///tmp/steering-predict]
//        [--kia_log_dir=DIR] [--duration_sec=N] [--panel_port=8089]
#include <cstdio>
#include <cstring>
#include <memory>
#include <sstream>
#include <string>

#include <unistd.h>

#include "pgcar/arduino_comm.h"
#include "pgcar/http_panel.h"
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

constexpr char kPanelHtml[] = R"html(<!doctype html>
<html><head><title>kia steering nn</title>
<style>body{background:#111;color:#ddd;font-family:monospace;margin:2em;}
button{margin:0.2em;padding:0.4em 1em;} .big{font-size:1.6em;}
#fed{color:#3d3;}</style></head><body>
<h3>kia_steering_nn</h3>
<div>measured angle: <span id="angle" class="big">?</span>&deg;</div>
<div>NN prediction: <span id="pred" class="big">?</span>&deg;</div>
<div>target: <span id="target">none</span></div>
<div>steering: <span id="fed">?</span></div>
<div style="margin-top:1em">
 <button onclick="cmd('e')">enable steering</button>
 <button onclick="cmd('d')">disable steering</button>
</div>
<div id="reply" style="margin-top:1em;color:#9a9;"></div>
<script>
async function cmd(c){
 const r = await fetch('/cmd?c='+encodeURIComponent(c));
 document.getElementById('reply').textContent = await r.text();
}
async function tick(){
 try{
  const s = await (await fetch('/state.json')).json();
  document.getElementById('angle').textContent =
    s.angle_valid ? s.angle_degrees.toFixed(1) : '?';
  document.getElementById('pred').textContent =
    s.prediction_valid ? s.prediction_degrees.toFixed(1) : '?';
  document.getElementById('target').textContent =
    s.target_set ? s.target_degrees.toFixed(1)+'°' : 'none';
  document.getElementById('fed').textContent =
    s.feed_enabled ? 'ENABLED' : 'disabled';
 }catch(e){}
 setTimeout(tick, 300);
}
tick();
</script></body></html>)html";
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

  // Feed-enabled mirror for the panel (the feeder keeps its flag private;
  // the panel is the only writer besides startup, so a local mirror stays
  // truthful).
  bool feed_enabled = true;
  std::unique_ptr<pgcar::HttpPanel> panel;
  const std::string panel_port = FlagValue(argc, argv, "panel_port", "");
  if (!panel_port.empty()) {
    panel = std::make_unique<pgcar::HttpPanel>(
        std::stoi(panel_port), kPanelHtml,
        [&car_data, &controller, &predictions, &feed_enabled]() {
          pgcar::Timestamped<pgcar::kia::SteeringAngle> angle;
          const bool angle_valid =
              car_data.steering_angles().get_latest(&angle);
          pgcar::Timestamped<double> pred;
          const bool pred_valid = predictions.predictions().get_latest(&pred);
          pgcar::Timestamped<pgcar::kia::TargetSteeringAngleStatus> target;
          const bool target_valid =
              controller.TargetSteeringAnglesHistory().get_latest(&target);
          std::ostringstream out;
          out << "{\"angle_valid\": " << (angle_valid ? "true" : "false")
              << ", \"angle_degrees\": "
              << (angle_valid ? angle.data().degrees() : 0.0)
              << ", \"prediction_valid\": " << (pred_valid ? "true" : "false")
              << ", \"prediction_degrees\": "
              << (pred_valid ? pred.data() : 0.0)
              << ", \"target_set\": "
              << ((target_valid && target.data().is_set) ? "true" : "false")
              << ", \"target_degrees\": "
              << (target_valid ? target.data().angle_degrees : 0.0)
              << ", \"feed_enabled\": " << (feed_enabled ? "true" : "false")
              << "}";
          return out.str();
        },
        [&feeder, &controller, &feed_enabled](const std::string &cmd) {
          if (cmd == "e") {
            feeder.SetFeedEnabled(true);
            feed_enabled = true;
            return std::string("steering enabled");
          }
          if (cmd == "d") {
            feeder.SetFeedEnabled(false);
            feed_enabled = false;
            controller.ClearTargetAngle();
            return std::string("steering disabled, target cleared");
          }
          return std::string("unknown command (e | d)");
        });
    if (panel->ok()) {
      std::printf("operator panel: http://127.0.0.1:%d/\n", panel->port());
    } else {
      std::fprintf(stderr, "cannot bind panel port %s\n", panel_port.c_str());
    }
  }

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
