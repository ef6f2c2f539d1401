// hunterrt: native runtime support for the TPU-native Hunter control stack.
//
// TPU-native equivalents of the reference's C++ runtime plumbing:
//   - UDP multicast transport with latest-wins semantics
//     (LCM bridge parity: legged_examples/legged_mujoco/src/mujoco_lcm/
//      MujocoLcm.cpp:7-45, lcm_msg schemas low_state_t / low_cmd_t)
//   - absolute-deadline rate keeper with overrun accounting
//     (legged_hw/src/LeggedHWLoop.cpp:38-79, SCHED_FIFO + cycle warnings)
//   - lock-free triple buffer for policy handoff between the solver thread
//     and the control thread (OCS2 MRT double-buffer / realtime_tools::
//      RealtimeBuffer parity, LeggedController.cpp:396-421)
//
// C ABI only — consumed from Python via ctypes (no pybind11 dependency).

#include <arpa/inet.h>
#include <atomic>
#include <cerrno>
#include <chrono>
#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <netinet/in.h>
#include <pthread.h>
#include <sched.h>
#include <sys/socket.h>
#include <time.h>
#include <unistd.h>

extern "C" {

// ---------------------------------------------------------------------------
// wire structs (fixed layout, little-endian hosts)
// ---------------------------------------------------------------------------

constexpr int NJ = 10;

struct LowState {          // sim/robot -> controller (low_state_t parity)
  double t;
  double quat[4];          // x y z w
  double gyro[3];          // base angular velocity, local
  double accel[3];         // base linear acceleration, local (specific force)
  double q[NJ];
  double dq[NJ];
  double tau[NJ];
  uint64_t seq;
};

struct LowCmd {            // controller -> sim/robot (low_cmd_t parity)
  double pos[NJ];
  double vel[NJ];
  double kp[NJ];
  double kd[NJ];
  double ff[NJ];
  uint64_t seq;
};

// ---------------------------------------------------------------------------
// UDP transport (multicast or unicast), latest-wins receive
// ---------------------------------------------------------------------------

struct UdpChannel {
  int sock = -1;
  sockaddr_in dest{};
  uint64_t last_seq = 0;
};

static int make_socket(const char* addr, int port, int is_recv, UdpChannel* ch) {
  int sock = socket(AF_INET, SOCK_DGRAM, 0);
  if (sock < 0) return -errno;
  int one = 1;
  setsockopt(sock, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
  in_addr ia{};
  inet_pton(AF_INET, addr, &ia);
  bool mcast = (ntohl(ia.s_addr) >> 28) == 0xE;

  if (is_recv) {
    sockaddr_in bind_addr{};
    bind_addr.sin_family = AF_INET;
    bind_addr.sin_port = htons(port);
    bind_addr.sin_addr.s_addr = htonl(INADDR_ANY);
    if (bind(sock, (sockaddr*)&bind_addr, sizeof(bind_addr)) < 0) {
      close(sock);
      return -errno;
    }
    if (mcast) {
      ip_mreq mreq{};
      mreq.imr_multiaddr = ia;
      mreq.imr_interface.s_addr = htonl(INADDR_ANY);
      setsockopt(sock, IPPROTO_IP, IP_ADD_MEMBERSHIP, &mreq, sizeof(mreq));
    }
    fcntl(sock, F_SETFL, O_NONBLOCK);
  } else if (mcast) {
    unsigned char ttl = 1;
    setsockopt(sock, IPPROTO_IP, IP_MULTICAST_TTL, &ttl, sizeof(ttl));
    unsigned char loop = 1;
    setsockopt(sock, IPPROTO_IP, IP_MULTICAST_LOOP, &loop, sizeof(loop));
  }
  ch->sock = sock;
  ch->dest.sin_family = AF_INET;
  ch->dest.sin_port = htons(port);
  ch->dest.sin_addr = ia;
  return 0;
}

void* rt_channel_open_send(const char* addr, int port) {
  auto* ch = new UdpChannel();
  if (make_socket(addr, port, 0, ch) != 0) {
    delete ch;
    return nullptr;
  }
  return ch;
}

void* rt_channel_open_recv(const char* addr, int port) {
  auto* ch = new UdpChannel();
  if (make_socket(addr, port, 1, ch) != 0) {
    delete ch;
    return nullptr;
  }
  return ch;
}

int rt_channel_send(void* h, const void* buf, int len) {
  auto* ch = (UdpChannel*)h;
  return (int)sendto(ch->sock, buf, len, 0, (sockaddr*)&ch->dest, sizeof(ch->dest));
}

// drain the socket, keep the newest datagram (latest-timestamp-wins,
// MujocoLcm::HandleLowState guard parity). Returns bytes of the last packet
// or 0 when nothing new arrived.
int rt_channel_recv_latest(void* h, void* buf, int len) {
  auto* ch = (UdpChannel*)h;
  int got = 0;
  while (true) {
    int n = (int)recv(ch->sock, buf, len, 0);
    if (n <= 0) break;
    got = n;
  }
  return got;
}

void rt_channel_close(void* h) {
  auto* ch = (UdpChannel*)h;
  if (ch->sock >= 0) close(ch->sock);
  delete ch;
}

// ---------------------------------------------------------------------------
// absolute-deadline rate keeper (LeggedHWLoop parity)
// ---------------------------------------------------------------------------

struct RateKeeper {
  timespec next{};
  long period_ns = 0;
  uint64_t cycles = 0;
  uint64_t overruns = 0;
  double worst_late_ms = 0.0;
  double sum_late_ms = 0.0;
};

static inline void ts_add(timespec* t, long ns) {
  t->tv_nsec += ns;
  while (t->tv_nsec >= 1000000000L) {
    t->tv_nsec -= 1000000000L;
    t->tv_sec += 1;
  }
}

void* rt_rate_create(double frequency_hz) {
  auto* rk = new RateKeeper();
  rk->period_ns = (long)(1e9 / frequency_hz);
  clock_gettime(CLOCK_MONOTONIC, &rk->next);
  ts_add(&rk->next, rk->period_ns);
  return rk;
}

// sleep until the next absolute deadline; returns lateness in ms (>0 means
// the cycle overran — the reference warns when elapsed > 2x period,
// LeggedHWLoop.cpp:63-69)
double rt_rate_sleep(void* h) {
  auto* rk = (RateKeeper*)h;
  timespec now{};
  clock_gettime(CLOCK_MONOTONIC, &now);
  double late_ms = (now.tv_sec - rk->next.tv_sec) * 1e3 +
                   (now.tv_nsec - rk->next.tv_nsec) * 1e-6;
  if (late_ms < 0) {
    clock_nanosleep(CLOCK_MONOTONIC, TIMER_ABSTIME, &rk->next, nullptr);
    late_ms = 0.0;
  } else {
    rk->overruns++;
    if (late_ms > rk->worst_late_ms) rk->worst_late_ms = late_ms;
    rk->sum_late_ms += late_ms;
    // re-anchor so one long stall doesn't cascade
    clock_gettime(CLOCK_MONOTONIC, &rk->next);
  }
  rk->cycles++;
  ts_add(&rk->next, rk->period_ns);
  return late_ms;
}

void rt_rate_stats(void* h, uint64_t* cycles, uint64_t* overruns,
                   double* worst_late_ms, double* avg_late_ms) {
  auto* rk = (RateKeeper*)h;
  *cycles = rk->cycles;
  *overruns = rk->overruns;
  *worst_late_ms = rk->worst_late_ms;
  *avg_late_ms = rk->overruns ? rk->sum_late_ms / rk->overruns : 0.0;
}

void rt_rate_destroy(void* h) { delete (RateKeeper*)h; }

// best-effort SCHED_FIFO elevation (ocs2::setThreadPriority parity)
int rt_set_realtime_priority(int priority) {
  sched_param sp{};
  sp.sched_priority = priority;
  return pthread_setschedparam(pthread_self(), SCHED_FIFO, &sp);
}

// ---------------------------------------------------------------------------
// lock-free triple buffer (fixed max payload) for policy / state handoff
// ---------------------------------------------------------------------------

struct TripleBuffer {
  static constexpr int kSlots = 3;
  int capacity = 0;
  uint8_t* slots[kSlots] = {nullptr, nullptr, nullptr};
  int sizes[kSlots] = {0, 0, 0};
  std::atomic<uint32_t> state;  // bits: [ back(2) | middle(2) | front(2) | fresh(1) ]

  explicit TripleBuffer(int cap) : capacity(cap), state(0u | (1u << 2) | (2u << 4)) {
    for (auto& s : slots) s = new uint8_t[cap];
  }
  ~TripleBuffer() {
    for (auto& s : slots) delete[] s;
  }
};

void* rt_tbuf_create(int capacity) { return new TripleBuffer(capacity); }
void rt_tbuf_destroy(void* h) { delete (TripleBuffer*)h; }

int rt_tbuf_write(void* h, const void* data, int len) {
  auto* tb = (TripleBuffer*)h;
  if (len > tb->capacity) return -1;
  uint32_t st = tb->state.load(std::memory_order_acquire);
  uint32_t back = st & 0x3;
  memcpy(tb->slots[back], data, len);
  tb->sizes[back] = len;
  // swap back <-> middle, set fresh bit
  uint32_t mid = (st >> 2) & 0x3;
  uint32_t front = (st >> 4) & 0x3;
  uint32_t ns = mid | (back << 2) | (front << 4) | (1u << 6);
  while (!tb->state.compare_exchange_weak(st, ns, std::memory_order_acq_rel)) {
    back = st & 0x3;
    mid = (st >> 2) & 0x3;
    front = (st >> 4) & 0x3;
    memcpy(tb->slots[back], data, len);
    tb->sizes[back] = len;
    ns = mid | (back << 2) | (front << 4) | (1u << 6);
  }
  return 0;
}

// returns payload size (0 if never written); swaps in the freshest slot
int rt_tbuf_read(void* h, void* out, int maxlen) {
  auto* tb = (TripleBuffer*)h;
  uint32_t st = tb->state.load(std::memory_order_acquire);
  if (st & (1u << 6)) {
    // swap middle <-> front, clear fresh
    uint32_t back = st & 0x3;
    uint32_t mid = (st >> 2) & 0x3;
    uint32_t front = (st >> 4) & 0x3;
    uint32_t ns = back | (front << 2) | (mid << 4);
    while (!tb->state.compare_exchange_weak(st, ns, std::memory_order_acq_rel)) {
      if (!(st & (1u << 6))) break;
      back = st & 0x3;
      mid = (st >> 2) & 0x3;
      front = (st >> 4) & 0x3;
      ns = back | (front << 2) | (mid << 4);
    }
  }
  st = tb->state.load(std::memory_order_acquire);
  uint32_t front = (st >> 4) & 0x3;
  int n = tb->sizes[front];
  if (n <= 0) return 0;
  if (n > maxlen) n = maxlen;
  memcpy(out, tb->slots[front], n);
  return n;
}

int rt_sizeof_low_state() { return (int)sizeof(LowState); }
int rt_sizeof_low_cmd() { return (int)sizeof(LowCmd); }

}  // extern "C"
