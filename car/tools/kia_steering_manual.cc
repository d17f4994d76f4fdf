// Manual steer-by-wire control console + HTTP operator panel.
//
// Replaces the reference's Qt manual-control window
// (src/kia_steering_ui.cc + src/ui_steering_manual/
// kia_steering_ui_main_window.cpp) for headless use; same wiring: CAN
// updater -> controller -> Arduino channel, with JSON drive logs. Control
// comes from either surface:
//   - stdin console:    a <degrees> | c | q
//   - --panel_port=N:   browser panel with live angle/target labels and
//                       the Qt window's set/clear/nudge buttons
//                       (pgcar/http_panel.h).
// Usage: kia_steering_manual --can_interface=can0 --arduino_tty=/dev/ttyUSB0
//        [--kia_log_dir=DIR] [--panel_port=8088]
#include <cstdio>
#include <cstring>
#include <iostream>
#include <memory>
#include <sstream>
#include <string>

#include "pgcar/arduino_comm.h"
#include "pgcar/http_panel.h"
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

// The Qt panel's labels + buttons as an HTML page (served by HttpPanel).
constexpr char kPanelHtml[] = R"html(<!doctype html>
<html><head><title>kia steering manual</title>
<style>body{background:#111;color:#ddd;font-family:monospace;margin:2em;}
button{margin:0.2em;padding:0.4em 1em;} #angle{font-size:2em;}
input{width:6em;}</style></head><body>
<h3>kia_steering_manual</h3>
<div>measured angle: <span id="angle">?</span>&deg;</div>
<div>target: <span id="target">none</span></div>
<div style="margin-top:1em">
 <input id="deg" type="number" value="0" step="1"/>
 <button onclick="cmd('a '+document.getElementById('deg').value)">set target</button>
 <button onclick="cmd('c')">clear</button>
</div>
<div>
 <button onclick="nudge(-5)">-5&deg;</button>
 <button onclick="nudge(-1)">-1&deg;</button>
 <button onclick="nudge(1)">+1&deg;</button>
 <button onclick="nudge(5)">+5&deg;</button>
</div>
<div id="reply" style="margin-top:1em;color:#9a9;"></div>
<script>
async function cmd(c){
 const r = await fetch('/cmd?c='+encodeURIComponent(c));
 document.getElementById('reply').textContent = await r.text();
}
async function nudge(d){
 const s = await (await fetch('/state.json')).json();
 const base = s.target_set ? s.target_degrees : (s.angle_valid ? s.angle_degrees : 0);
 cmd('a '+(base+d));
}
async function tick(){
 try{
  const s = await (await fetch('/state.json')).json();
  document.getElementById('angle').textContent =
    s.angle_valid ? s.angle_degrees.toFixed(1) : '?';
  document.getElementById('target').textContent =
    s.target_set ? s.target_degrees.toFixed(1)+'°' : 'none';
 }catch(e){}
 setTimeout(tick, 300);
}
tick();
</script></body></html>)html";
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

  // One command interpreter serves both control surfaces (stdin console
  // and the HTTP panel) so behavior cannot drift between them.
  auto apply_command = [&controller](const std::string &line) -> std::string {
    std::istringstream parts(line);
    std::string op;
    parts >> op;
    if (op == "c") {
      controller.ClearTargetAngle();
      return "target cleared";
    }
    if (op == "a") {
      double degrees = 0;
      if (parts >> degrees) {
        return controller.SetTargetAngle(degrees)
                   ? "target set to " + std::to_string(degrees)
                   : "target rejected (out of range)";
      }
      return "usage: a <degrees>";
    }
    return "unknown command (a <degrees> | c)";
  };

  std::unique_ptr<pgcar::HttpPanel> panel;
  const std::string panel_port = FlagValue(argc, argv, "panel_port", "");
  if (!panel_port.empty()) {
    panel = std::make_unique<pgcar::HttpPanel>(
        std::stoi(panel_port), kPanelHtml,
        [&car_data, &controller]() {
          pgcar::Timestamped<pgcar::kia::SteeringAngle> angle;
          const bool angle_valid = car_data.steering_angles().get_latest(&angle);
          pgcar::Timestamped<pgcar::kia::TargetSteeringAngleStatus> target;
          const bool target_valid =
              controller.TargetSteeringAnglesHistory().get_latest(&target);
          std::ostringstream out;
          out << "{\"angle_valid\": " << (angle_valid ? "true" : "false")
              << ", \"angle_degrees\": "
              << (angle_valid ? angle.data().degrees() : 0.0)
              << ", \"target_set\": "
              << ((target_valid && target.data().is_set) ? "true" : "false")
              << ", \"target_degrees\": "
              << (target_valid ? target.data().angle_degrees : 0.0) << "}";
          return out.str();
        },
        apply_command);
    if (panel->ok()) {
      std::printf("operator panel: http://127.0.0.1:%d/\n", panel->port());
    } else {
      std::fprintf(stderr, "cannot bind panel port %s\n", panel_port.c_str());
    }
  }

  std::printf("commands: a <degrees> | c | q\n");
  std::string line;
  while (std::getline(std::cin, line)) {
    if (line == "q") break;
    std::printf("%s\n", apply_command(line).c_str());
  }

  controller.Stop();
  can_updater.stop();
  return 0;
}
