// Fail-fast assertion macros (stand-in for glog CHECK*, which the reference
// uses throughout its car stack; this tree is dependency-free).
#ifndef PGCAR_CHECK_H_
#define PGCAR_CHECK_H_

#include <cstdio>
#include <cstdlib>

#define PGCAR_CHECK_IMPL(cond, text)                                          \
  do {                                                                        \
    if (!(cond)) {                                                            \
      std::fprintf(stderr, "CHECK failed at %s:%d: %s\n", __FILE__, __LINE__, \
                   text);                                                     \
      std::abort();                                                           \
    }                                                                         \
  } while (0)

#define PG_CHECK(cond) PGCAR_CHECK_IMPL((cond), #cond)
#define PG_CHECK_EQ(a, b) PGCAR_CHECK_IMPL((a) == (b), #a " == " #b)
#define PG_CHECK_NE(a, b) PGCAR_CHECK_IMPL((a) != (b), #a " != " #b)
#define PG_CHECK_GT(a, b) PGCAR_CHECK_IMPL((a) > (b), #a " > " #b)
#define PG_CHECK_GE(a, b) PGCAR_CHECK_IMPL((a) >= (b), #a " >= " #b)
#define PG_CHECK_LT(a, b) PGCAR_CHECK_IMPL((a) < (b), #a " < " #b)
#define PG_CHECK_LE(a, b) PGCAR_CHECK_IMPL((a) <= (b), #a " <= " #b)
#define PG_CHECK_NOTNULL(p) PGCAR_CHECK_IMPL((p) != nullptr, #p " != null")

#endif  // PGCAR_CHECK_H_
