// Minimal embedded HTTP operator panel.
//
// Headless-image replacement for the reference's Qt operator windows
// (/root/reference/src/ui_steering_manual/kia_steering_ui_main_window.cpp,
// src/ui_steering_nn/steering_nn_main_window.cpp): instead of a local Qt
// MainWindow with live labels and buttons, the steering tools serve a tiny
// HTML panel over HTTP — any browser on the operator laptop shows live
// steering state and sends the same commands the Qt buttons did. The
// tools' control wiring (CAN updater -> controller -> Arduino channel,
// JSON drive loggers) is unchanged; the panel is a pure view/command shim.
//
// Routes:
//   GET /            the HTML panel handed to the constructor
//   GET /state.json  state_fn() — caller-composed JSON snapshot
//   GET /cmd?c=...   command_fn(urldecoded command) -> plain-text reply
//
// Implementation: plain POSIX sockets + one accept-loop thread, one
// short-lived connection per request (Connection: close), no dependencies.
// This mirrors the threading discipline of the Qt read-threads it replaces
// (src/ui/timestamped_history_qt_helpers.h): the panel thread only ever
// READS through the injected callbacks, which wrap mutex-guarded
// TimestampedHistory state underneath.
#ifndef PGCAR_HTTP_PANEL_H_
#define PGCAR_HTTP_PANEL_H_

#include <arpa/inet.h>
#include <netinet/in.h>
#include <sys/socket.h>
#include <unistd.h>

#include <atomic>
#include <cstring>
#include <functional>
#include <string>
#include <thread>

namespace pgcar {

class HttpPanel {
 public:
  using StateFn = std::function<std::string()>;
  using CommandFn = std::function<std::string(const std::string&)>;

  // Binds 127.0.0.1:port (port 0 = ephemeral, read back via port()).
  // Invalid on failure — check ok().
  HttpPanel(int port, std::string html, StateFn state_fn, CommandFn command_fn)
      : html_(std::move(html)),
        state_fn_(std::move(state_fn)),
        command_fn_(std::move(command_fn)) {
    listen_fd_ = ::socket(AF_INET, SOCK_STREAM, 0);
    if (listen_fd_ < 0) return;
    int one = 1;
    ::setsockopt(listen_fd_, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
    sockaddr_in addr{};
    addr.sin_family = AF_INET;
    addr.sin_addr.s_addr = htonl(INADDR_LOOPBACK);
    addr.sin_port = htons(static_cast<uint16_t>(port));
    if (::bind(listen_fd_, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) <
            0 ||
        ::listen(listen_fd_, 8) < 0) {
      ::close(listen_fd_);
      listen_fd_ = -1;
      return;
    }
    socklen_t len = sizeof(addr);
    ::getsockname(listen_fd_, reinterpret_cast<sockaddr*>(&addr), &len);
    port_ = ntohs(addr.sin_port);
    thread_ = std::thread([this] { AcceptLoop(); });
  }

  ~HttpPanel() { Stop(); }

  bool ok() const { return listen_fd_ >= 0; }
  int port() const { return port_; }

  void Stop() {
    if (stopped_.exchange(true)) return;
    if (listen_fd_ >= 0) {
      ::shutdown(listen_fd_, SHUT_RDWR);
      ::close(listen_fd_);
    }
    if (thread_.joinable()) thread_.join();
  }

 private:
  static std::string UrlDecode(const std::string& s) {
    std::string out;
    out.reserve(s.size());
    for (size_t i = 0; i < s.size(); ++i) {
      if (s[i] == '+') {
        out.push_back(' ');
      } else if (s[i] == '%' && i + 2 < s.size()) {
        out.push_back(static_cast<char>(
            std::stoi(s.substr(i + 1, 2), nullptr, 16)));
        i += 2;
      } else {
        out.push_back(s[i]);
      }
    }
    return out;
  }

  void Respond(int fd, const char* status, const char* ctype,
               const std::string& body) {
    std::string head = std::string("HTTP/1.1 ") + status +
                       "\r\nContent-Type: " + ctype +
                       "\r\nContent-Length: " + std::to_string(body.size()) +
                       "\r\nCache-Control: no-store"
                       "\r\nConnection: close\r\n\r\n";
    (void)!::write(fd, head.data(), head.size());
    (void)!::write(fd, body.data(), body.size());
  }

  void HandleConnection(int fd) {
    char buf[2048];
    ssize_t n = ::read(fd, buf, sizeof(buf) - 1);
    if (n <= 0) {
      ::close(fd);
      return;
    }
    buf[n] = '\0';
    // "GET <path> HTTP/1.x"
    std::string req(buf);
    std::string path;
    if (req.compare(0, 4, "GET ") == 0) {
      size_t end = req.find(' ', 4);
      if (end != std::string::npos) path = req.substr(4, end - 4);
    }
    if (path == "/" || path == "/index.html") {
      Respond(fd, "200 OK", "text/html", html_);
    } else if (path == "/state.json") {
      Respond(fd, "200 OK", "application/json", state_fn_());
    } else if (path.compare(0, 7, "/cmd?c=") == 0) {
      Respond(fd, "200 OK", "text/plain",
              command_fn_(UrlDecode(path.substr(7))));
    } else {
      Respond(fd, "404 Not Found", "text/plain", "not found");
    }
    ::close(fd);
  }

  void AcceptLoop() {
    while (!stopped_.load()) {
      int fd = ::accept(listen_fd_, nullptr, nullptr);
      if (fd < 0) {
        if (stopped_.load()) return;
        continue;
      }
      HandleConnection(fd);
    }
  }

  std::string html_;
  StateFn state_fn_;
  CommandFn command_fn_;
  int listen_fd_ = -1;
  int port_ = 0;
  std::atomic<bool> stopped_{false};
  std::thread thread_;
};

}  // namespace pgcar

#endif  // PGCAR_HTTP_PANEL_H_
