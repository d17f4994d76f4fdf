// Minimal single-header unit-test framework.
//
// The reference builds its car-stack tests on gtest fetched at build time
// (CMakeLists.txt:33-77); this container has no network, so the same test
// style (TEST cases, EXPECT_* checks, EXPECT_DEATH via fork) is provided
// dependency-free here.
#ifndef PGCAR_TESTING_H_
#define PGCAR_TESTING_H_

#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <functional>
#include <string>
#include <sys/types.h>
#include <sys/wait.h>
#include <unistd.h>
#include <vector>

namespace pgtest {

struct TestCase {
  const char *name;
  std::function<void()> body;
};

inline std::vector<TestCase> &Registry() {
  static std::vector<TestCase> cases;
  return cases;
}

inline int &FailureCount() {
  static int failures = 0;
  return failures;
}

struct Registrar {
  Registrar(const char *name, std::function<void()> body) {
    Registry().push_back({name, std::move(body)});
  }
};

inline void ReportFailure(const char *file, int line, const std::string &msg) {
  std::fprintf(stderr, "  FAILED %s:%d: %s\n", file, line, msg.c_str());
  ++FailureCount();
}

// Runs `body` in a forked child; passes when the child dies abnormally
// (abort / nonzero exit), like gtest's death tests.
inline bool DiesAbnormally(const std::function<void()> &body) {
  fflush(nullptr);
  const pid_t pid = fork();
  if (pid == 0) {
    // Child: silence stderr so expected CHECK failures don't pollute output.
    freopen("/dev/null", "w", stderr);
    body();
    _exit(0);
  }
  int status = 0;
  waitpid(pid, &status, 0);
  return !(WIFEXITED(status) && WEXITSTATUS(status) == 0);
}

inline int RunAll() {
  int failed_cases = 0;
  for (const TestCase &test : Registry()) {
    const int before = FailureCount();
    std::printf("[ RUN  ] %s\n", test.name);
    test.body();
    if (FailureCount() > before) {
      std::printf("[ FAIL ] %s\n", test.name);
      ++failed_cases;
    } else {
      std::printf("[  OK  ] %s\n", test.name);
    }
  }
  std::printf("%zu test(s), %d failed\n", Registry().size(), failed_cases);
  return failed_cases == 0 ? 0 : 1;
}

}  // namespace pgtest

#define PGTEST_CONCAT_INNER(a, b) a##b
#define PGTEST_CONCAT(a, b) PGTEST_CONCAT_INNER(a, b)

#define TEST(suite, name)                                                     \
  static void PGTEST_CONCAT(suite, PGTEST_CONCAT(_, name))();                 \
  static ::pgtest::Registrar PGTEST_CONCAT(                                   \
      registrar_, PGTEST_CONCAT(suite, PGTEST_CONCAT(_, name)))(              \
      #suite "." #name, PGTEST_CONCAT(suite, PGTEST_CONCAT(_, name)));        \
  static void PGTEST_CONCAT(suite, PGTEST_CONCAT(_, name))()

#define EXPECT_TRUE(cond)                                                     \
  do {                                                                        \
    if (!(cond))                                                              \
      ::pgtest::ReportFailure(__FILE__, __LINE__, "expected true: " #cond);   \
  } while (0)

#define EXPECT_FALSE(cond)                                                    \
  do {                                                                        \
    if (cond)                                                                 \
      ::pgtest::ReportFailure(__FILE__, __LINE__, "expected false: " #cond);  \
  } while (0)

#define EXPECT_EQ(a, b)                                                       \
  do {                                                                        \
    if (!((a) == (b)))                                                        \
      ::pgtest::ReportFailure(__FILE__, __LINE__, #a " == " #b);              \
  } while (0)

#define EXPECT_NE(a, b)                                                       \
  do {                                                                        \
    if ((a) == (b))                                                           \
      ::pgtest::ReportFailure(__FILE__, __LINE__, #a " != " #b);              \
  } while (0)

#define EXPECT_NEAR(a, b, tol)                                                \
  do {                                                                        \
    if (!(std::fabs((a) - (b)) <= (tol)))                                     \
      ::pgtest::ReportFailure(                                                \
          __FILE__, __LINE__,                                                 \
          std::string(#a " ~ " #b " within " #tol ", got |") +                \
              std::to_string((double)(a)) + " - " +                           \
              std::to_string((double)(b)) + "|");                             \
  } while (0)

#define EXPECT_DEATH(statement)                                               \
  do {                                                                        \
    if (!::pgtest::DiesAbnormally([&]() { statement; }))                      \
      ::pgtest::ReportFailure(__FILE__, __LINE__,                             \
                              "expected death: " #statement);                 \
  } while (0)

#define PGTEST_MAIN()                                                         \
  int main() { return ::pgtest::RunAll(); }

#endif  // PGCAR_TESTING_H_
