// HttpPanel test over a real loopback socket: the panel is the headless
// replacement for the reference's Qt operator windows
// (src/ui_steering_manual/kia_steering_ui_main_window.cpp), so the test
// drives it exactly as a browser would — raw GETs for the page, the state
// snapshot, and url-encoded commands — and checks that commands reach the
// injected handler decoded.

#include "pgcar/http_panel.h"

#include <arpa/inet.h>
#include <netinet/in.h>
#include <sys/socket.h>
#include <unistd.h>

#include <string>
#include <vector>

#include "pgcar/testing.h"

namespace pgcar {
namespace {

std::string HttpGet(int port, const std::string& path) {
  int fd = ::socket(AF_INET, SOCK_STREAM, 0);
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_addr.s_addr = htonl(INADDR_LOOPBACK);
  addr.sin_port = htons(static_cast<uint16_t>(port));
  if (::connect(fd, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) < 0) {
    ::close(fd);
    return "";
  }
  const std::string req = "GET " + path + " HTTP/1.1\r\nHost: x\r\n\r\n";
  (void)!::write(fd, req.data(), req.size());
  std::string out;
  char buf[4096];
  ssize_t n;
  while ((n = ::read(fd, buf, sizeof(buf))) > 0) out.append(buf, n);
  ::close(fd);
  return out;
}

std::string Body(const std::string& response) {
  const size_t split = response.find("\r\n\r\n");
  return split == std::string::npos ? "" : response.substr(split + 4);
}

TEST(HttpPanel, ServesPageStateAndDecodedCommands) {
  std::vector<std::string> commands;
  HttpPanel panel(
      0, "<html>PANEL</html>",
      [] { return std::string("{\"angle_degrees\": 12.5}"); },
      [&commands](const std::string& cmd) {
        commands.push_back(cmd);
        return "ok:" + cmd;
      });
  EXPECT_TRUE(panel.ok());
  EXPECT_TRUE(panel.port() > 0);

  const std::string page = HttpGet(panel.port(), "/");
  EXPECT_NE(page.find("200 OK"), std::string::npos);
  EXPECT_EQ(Body(page), "<html>PANEL</html>");

  const std::string state = HttpGet(panel.port(), "/state.json");
  EXPECT_NE(state.find("application/json"), std::string::npos);
  EXPECT_EQ(Body(state), "{\"angle_degrees\": 12.5}");

  // "a 15" url-encoded both ways: '+' and %20.
  EXPECT_EQ(Body(HttpGet(panel.port(), "/cmd?c=a+15")), "ok:a 15");
  EXPECT_EQ(Body(HttpGet(panel.port(), "/cmd?c=a%2015.5")), "ok:a 15.5");
  EXPECT_EQ(commands.size(), static_cast<size_t>(2));
  EXPECT_EQ(commands[0], "a 15");
  EXPECT_EQ(commands[1], "a 15.5");

  const std::string missing = HttpGet(panel.port(), "/nope");
  EXPECT_NE(missing.find("404"), std::string::npos);

  panel.Stop();
  // After Stop the port no longer accepts (empty response).
  EXPECT_EQ(HttpGet(panel.port(), "/"), "");
}

}  // namespace
}  // namespace pgcar

PGTEST_MAIN()
