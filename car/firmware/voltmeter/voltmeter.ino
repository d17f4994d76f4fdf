// Serial-plotter voltmeter for probing the torque-sensor lines before
// wiring the spoof box (reference tool: sketches/voltmeter/voltmeter.ino).
//
// Samples a configurable set of analog pins and emits one CSV line per
// sweep at 115200 baud, suitable for the Arduino Serial Plotter or a
// logging host. A short settle delay between channels lets the ADC sample
// capacitor recover after switching inputs.

namespace {

constexpr uint8_t kInputPins[] = {A0, A1};
constexpr unsigned long kChannelSettleMs = 2;
constexpr unsigned long kSweepPeriodMs = 10;

}  // namespace

void setup() {
  for (uint8_t pin : kInputPins) {
    pinMode(pin, INPUT);
  }
  Serial.begin(115200);
}

void loop() {
  const size_t num_pins = sizeof(kInputPins) / sizeof(kInputPins[0]);
  for (size_t i = 0; i < num_pins; ++i) {
    Serial.print(analogRead(kInputPins[i]));
    Serial.print(i + 1 < num_pins ? ',' : '\n');
    delay(kChannelSettleMs);
  }
  delay(kSweepPeriodMs);
}
