// Standalone selftest driver — built with -fsanitize=address,leak (the
// reference compiles all tests under ASan+LSan, tests/CMakeLists.txt:6-9);
// exercises the MPMC queue / pool / locks under the sanitizer.
extern "C" int hpc_native_selftest();
#include <cstdio>
int main() {
  int rc = hpc_native_selftest();
  std::printf("selftest rc=%d\n", rc);
  return rc;
}
