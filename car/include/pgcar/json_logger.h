// Background JSON logging of TimestampedHistory streams during drives.
//
// Mirrors TimestampedJsonLogger (include/io/timestamped_json_logger.hpp):
// a polling thread (50 ms) appends every new history element to an
// incrementally-written JSON file {"<root>": [ {...}, ... ]} — hand-framed so
// the file is valid JSON after Stop() and still salvageable on crash.
#ifndef PGCAR_JSON_LOGGER_H_
#define PGCAR_JSON_LOGGER_H_

#include <atomic>
#include <fstream>
#include <functional>
#include <memory>
#include <string>
#include <thread>

#include "pgcar/timestamped_history.h"

namespace pgcar {

template <typename T> class TimestampedJsonLogger {
 public:
  // value_writer renders the JSON fields of one value, e.g.
  //   [](const double &v, std::ostream &out) { out << "\"value\": " << v; }
  TimestampedJsonLogger(const std::string &filename,
                        const std::string &root_element_name,
                        std::function<void(const T &, std::ostream &)>
                            value_writer,
                        const TimestampedHistory<T> *history,
                        int poll_interval_usec = 50000)
      : value_writer_(std::move(value_writer)),
        history_(history),
        poll_interval_usec_(poll_interval_usec),
        out_(filename) {
    out_ << "{\n  \"" << root_element_name << "\": [";
    thread_ = std::make_unique<std::thread>(&TimestampedJsonLogger::Loop, this);
  }

  ~TimestampedJsonLogger() { Stop(); }

  void Stop() {
    if (thread_ != nullptr) {
      must_run_ = false;
      thread_->join();
      thread_.reset();
      out_ << "\n  ]\n}\n";
      out_.close();
    }
  }

 private:
  void Loop() {
    Timestamped<T> item = {{}, {0, 0}};
    const timeval timeout = {poll_interval_usec_ / 1000000,
                             poll_interval_usec_ % 1000000};
    while (must_run_) {
      if (!history_->wait_get_next(item.timestamp(), &timeout, &item)) {
        continue;
      }
      const int64_t time_usec =
          static_cast<int64_t>(item.timestamp().tv_sec) * 1000000 +
          item.timestamp().tv_usec;
      out_ << (first_ ? "\n" : ",\n");
      first_ = false;
      out_ << "    {\"time_usec\": " << time_usec << ", ";
      value_writer_(item.data(), out_);
      out_ << "}";
      out_.flush();
    }
  }

  const std::function<void(const T &, std::ostream &)> value_writer_;
  const TimestampedHistory<T> *const history_;
  const int poll_interval_usec_;
  std::ofstream out_;
  bool first_ = true;
  std::atomic<bool> must_run_{true};
  std::unique_ptr<std::thread> thread_;
};

}  // namespace pgcar

#endif  // PGCAR_JSON_LOGGER_H_
