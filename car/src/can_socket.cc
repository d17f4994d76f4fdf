#include "pgcar/can_socket.h"

#include <cstring>

#include <linux/can.h>
#include <linux/sockios.h>
#include <linux/can/raw.h>
#include <net/if.h>
#include <sys/ioctl.h>
#include <sys/socket.h>
#include <sys/time.h>
#include <unistd.h>

namespace pgcar {

CanIdFilter MakeCanFilter(const std::vector<uint32_t> &accepted_ids) {
  CanIdFilter out;
  if (accepted_ids.empty()) return out;
  // Bits set in every accepted id stay in the filter; bits that differ
  // across ids are masked out so any value passes there.
  uint32_t common_ones = accepted_ids[0];
  uint32_t common_zeros = ~accepted_ids[0];
  for (const uint32_t id : accepted_ids) {
    common_ones &= id;
    common_zeros &= ~id;
  }
  out.id = common_ones;
  out.mask = (common_ones | common_zeros) & CAN_SFF_MASK;
  return out;
}

int ConnectCanSocket(const std::string &interface_name,
                     const std::vector<uint32_t> &accepted_ids) {
  const int fd = socket(PF_CAN, SOCK_RAW, CAN_RAW);
  if (fd < 0) return -1;

  if (!accepted_ids.empty()) {
    const CanIdFilter combined = MakeCanFilter(accepted_ids);
    can_filter filter;
    filter.can_id = combined.id;
    filter.can_mask = combined.mask;
    if (setsockopt(fd, SOL_CAN_RAW, CAN_RAW_FILTER, &filter, sizeof(filter)) !=
        0) {
      close(fd);
      return -1;
    }
  }

  ifreq ifr;
  std::memset(&ifr, 0, sizeof(ifr));
  std::strncpy(ifr.ifr_name, interface_name.c_str(), IFNAMSIZ - 1);
  if (ioctl(fd, SIOCGIFINDEX, &ifr) != 0) {
    close(fd);
    return -1;
  }

  sockaddr_can addr;
  std::memset(&addr, 0, sizeof(addr));
  addr.can_family = AF_CAN;
  addr.can_ifindex = ifr.ifr_ifindex;
  if (bind(fd, reinterpret_cast<sockaddr *>(&addr), sizeof(addr)) != 0) {
    close(fd);
    return -1;
  }
  return fd;
}

bool ReadCanFrame(int fd, CanFrame *frame, timeval *timestamp) {
  can_frame raw;
  const ssize_t n = read(fd, &raw, sizeof(raw));
  if (n != static_cast<ssize_t>(sizeof(raw))) return false;
  if (timestamp != nullptr) {
    if (ioctl(fd, SIOCGSTAMP, timestamp) != 0) {
      gettimeofday(timestamp, nullptr);
    }
  }
  frame->id = raw.can_id;
  frame->length = raw.can_dlc > kCanMaxPayload ? kCanMaxPayload : raw.can_dlc;
  std::memcpy(frame->data, raw.data, frame->length);
  return true;
}

}  // namespace pgcar
