// Linux SocketCAN access with kernel-side id filtering.
//
// Mirrors the reference's socket setup (src/car/can.cc:17-54, 126-143):
// a RAW CAN socket bound to the named interface, with a single
// filter/mask pair covering the accepted ids (bits that differ between
// accepted ids are masked out).
#ifndef PGCAR_CAN_SOCKET_H_
#define PGCAR_CAN_SOCKET_H_

#include <cstdint>
#include <string>
#include <vector>

#include "pgcar/can_frame.h"

namespace pgcar {

struct CanIdFilter {
  uint32_t id = 0;
  uint32_t mask = 0;
};

// Combined filter accepting every id in `accepted_ids`: the filter id is the
// common bits, the mask keeps only bits equal across all accepted ids (so it
// may also accept some additional ids, like the reference's make_can_filter).
CanIdFilter MakeCanFilter(const std::vector<uint32_t> &accepted_ids);

// Opens + binds a RAW CAN socket; returns the fd or -1.
int ConnectCanSocket(const std::string &interface_name,
                     const std::vector<uint32_t> &accepted_ids);

// Blocking read of one frame (with an optional SO_RCVTIMEO set by caller);
// fills `timestamp` from the kernel receive timestamp. Returns false on
// timeout/error.
bool ReadCanFrame(int fd, CanFrame *frame, timeval *timestamp);

}  // namespace pgcar

#endif  // PGCAR_CAN_SOCKET_H_
