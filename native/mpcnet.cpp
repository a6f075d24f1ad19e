// mpcnet: native full-mesh party transport.
//
// The TPU-build equivalent of the reference's mpc-net crate
// (`mpc-net/src/multi.rs`): each party listens on its address, lower ids
// dial higher ids, the party id is exchanged as the first u32, and every
// message travels as a [u32 BE length][u8 channel] framed packet over one of
// NUM_CHANNELS logical channels per peer (the reference multiplexes 3
// substreams via async-smux, `multi.rs:73-109`; here channels are tagged
// frames demuxed into per-channel queues).  Byte counters mirror
// `multi.rs:117-118,527-536`.
//
// Exposed as a C ABI for ctypes (no pybind11 in the image).

#include <arpa/inet.h>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <sys/socket.h>
#include <unistd.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr int NUM_CHANNELS = 3;

struct Frame {
  std::vector<uint8_t> data;
};

struct PeerQueues {
  std::mutex mu;
  std::condition_variable cv;
  std::deque<Frame> q[NUM_CHANNELS];
  bool dead = false;
};

struct Net {
  int party_id = -1;
  int n_parties = 0;
  std::vector<std::string> hosts;
  std::vector<int> ports;
  std::vector<int> socks;              // per peer (self = -1)
  std::vector<std::mutex> send_mu;     // per peer write lock
  std::vector<PeerQueues> queues;      // per peer inbound
  std::vector<std::thread> readers;
  std::atomic<uint64_t> bytes_sent{0};
  std::atomic<uint64_t> bytes_recv{0};
  std::atomic<uint64_t> broadcasts{0};
  std::atomic<bool> stop{false};
  int listen_fd = -1;

  Net(int id, int n) : party_id(id), n_parties(n), socks(n, -1),
                       send_mu(n), queues(n) {}
};

bool write_all(int fd, const uint8_t* buf, size_t len) {
  while (len > 0) {
    ssize_t w = ::send(fd, buf, len, MSG_NOSIGNAL);
    if (w <= 0) return false;
    buf += w;
    len -= static_cast<size_t>(w);
  }
  return true;
}

bool read_all(int fd, uint8_t* buf, size_t len) {
  while (len > 0) {
    ssize_t r = ::recv(fd, buf, len, 0);
    if (r <= 0) return false;
    buf += r;
    len -= static_cast<size_t>(r);
  }
  return true;
}

void reader_loop(Net* net, int peer) {
  int fd = net->socks[peer];
  for (;;) {
    uint8_t hdr[5];
    if (!read_all(fd, hdr, 5)) break;
    uint32_t len = (uint32_t(hdr[0]) << 24) | (uint32_t(hdr[1]) << 16) |
                   (uint32_t(hdr[2]) << 8) | uint32_t(hdr[3]);
    uint8_t chan = hdr[4];
    Frame f;
    f.data.resize(len);
    if (!read_all(fd, f.data.data(), len)) break;
    net->bytes_recv += len + 5;
    if (chan >= NUM_CHANNELS) chan = 0;
    {
      std::lock_guard<std::mutex> lk(net->queues[peer].mu);
      net->queues[peer].q[chan].push_back(std::move(f));
    }
    net->queues[peer].cv.notify_all();
  }
  {
    std::lock_guard<std::mutex> lk(net->queues[peer].mu);
    net->queues[peer].dead = true;
  }
  net->queues[peer].cv.notify_all();
}

int send_frame(Net* net, int peer, int chan, const uint8_t* buf,
               uint32_t len) {
  uint8_t hdr[5] = {uint8_t(len >> 24), uint8_t(len >> 16), uint8_t(len >> 8),
                    uint8_t(len), uint8_t(chan)};
  std::lock_guard<std::mutex> lk(net->send_mu[peer]);
  if (!write_all(net->socks[peer], hdr, 5)) return -1;
  if (len && !write_all(net->socks[peer], buf, len)) return -1;
  net->bytes_sent += len + 5;
  return 0;
}

// Pop one frame from peer/chan; blocks. Returns false if the stream died.
bool recv_frame(Net* net, int peer, int chan, Frame* out) {
  auto& pq = net->queues[peer];
  std::unique_lock<std::mutex> lk(pq.mu);
  pq.cv.wait(lk, [&] { return !pq.q[chan].empty() || pq.dead; });
  if (pq.q[chan].empty()) return false;
  *out = std::move(pq.q[chan].front());
  pq.q[chan].pop_front();
  return true;
}

int make_listener(int port) {
  int fd = ::socket(AF_INET, SOCK_STREAM, 0);
  if (fd < 0) return -1;
  int one = 1;
  setsockopt(fd, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_addr.s_addr = htonl(INADDR_ANY);
  addr.sin_port = htons(static_cast<uint16_t>(port));
  if (::bind(fd, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) < 0) {
    ::close(fd);
    return -1;
  }
  if (::listen(fd, 64) < 0) {
    ::close(fd);
    return -1;
  }
  return fd;
}

int dial(const std::string& host, int port, int retries = 300) {
  for (int i = 0; i < retries; i++) {
    int fd = ::socket(AF_INET, SOCK_STREAM, 0);
    if (fd < 0) return -1;
    sockaddr_in addr{};
    addr.sin_family = AF_INET;
    addr.sin_port = htons(static_cast<uint16_t>(port));
    if (inet_pton(AF_INET, host.c_str(), &addr.sin_addr) != 1) {
      ::close(fd);
      return -1;
    }
    if (::connect(fd, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) == 0) {
      int one = 1;
      setsockopt(fd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));
      return fd;
    }
    ::close(fd);
    // the reference retries 30x with 1s sleeps (`multi.rs:292-300`);
    // finer-grained here
    usleep(100 * 1000);
  }
  return -1;
}

}  // namespace

extern "C" {

void* mpcnet_create(int party_id, int n_parties, const char** hosts,
                    const int* ports) {
  auto* net = new Net(party_id, n_parties);
  for (int i = 0; i < n_parties; i++) {
    net->hosts.emplace_back(hosts[i]);
    net->ports.push_back(ports[i]);
  }
  return net;
}

// Full-mesh bootstrap: listen, dial lower->higher, exchange ids, then a
// barrier round (everyone sends+receives one empty frame on channel 0),
// mirroring `multi.rs:219-354`.
int mpcnet_connect(void* h) {
  auto* net = static_cast<Net*>(h);
  const int me = net->party_id;
  const int n = net->n_parties;
  if (me < n - 1) {  // higher-id parties will dial us
    net->listen_fd = make_listener(net->ports[me]);
    if (net->listen_fd < 0) return -1;
  }
  std::thread accepter([&] {
    // accept from every higher-id party
    for (int cnt = me + 1; cnt < n; cnt++) {
      int fd = ::accept(net->listen_fd, nullptr, nullptr);
      if (fd < 0) return;
      int one = 1;
      setsockopt(fd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));
      uint32_t peer_be;
      if (!read_all(fd, reinterpret_cast<uint8_t*>(&peer_be), 4)) return;
      int peer = static_cast<int>(ntohl(peer_be));
      if (peer <= me || peer >= n) {
        ::close(fd);
        return;
      }
      net->socks[peer] = fd;
    }
  });
  // dial every lower-id party, announcing our id (`multi.rs:251-317`)
  bool ok = true;
  for (int peer = 0; peer < me; peer++) {
    int fd = dial(net->hosts[peer], net->ports[peer]);
    if (fd < 0) {
      ok = false;
      break;
    }
    uint32_t me_be = htonl(static_cast<uint32_t>(me));
    if (!write_all(fd, reinterpret_cast<uint8_t*>(&me_be), 4)) {
      ok = false;
      break;
    }
    net->socks[peer] = fd;
  }
  accepter.join();
  if (net->listen_fd >= 0) {
    ::close(net->listen_fd);
    net->listen_fd = -1;
  }
  if (!ok) return -1;
  for (int p = 0; p < n; p++) {
    if (p != me && net->socks[p] < 0) return -1;
  }
  for (int p = 0; p < n; p++) {
    if (p != me) net->readers.emplace_back(reader_loop, net, p);
  }
  // genesis barrier (`multi.rs:330-337`)
  for (int p = 0; p < n; p++) {
    if (p == me) continue;
    if (send_frame(net, p, 0, nullptr, 0) != 0) return -1;
  }
  for (int p = 0; p < n; p++) {
    if (p == me) continue;
    Frame f;
    if (!recv_frame(net, p, 0, &f)) return -1;
  }
  return 0;
}

int mpcnet_send(void* h, int to, int chan, const uint8_t* buf, uint32_t len) {
  return send_frame(static_cast<Net*>(h), to, chan, buf, len);
}

// Receive one frame; *len in = capacity, out = actual. Returns -1 on dead
// stream, -2 if the buffer is too small (frame is then dropped).
int mpcnet_recv(void* h, int from, int chan, uint8_t* buf, uint32_t* len) {
  Frame f;
  if (!recv_frame(static_cast<Net*>(h), from, chan, &f)) return -1;
  if (f.data.size() > *len) return -2;
  std::memcpy(buf, f.data.data(), f.data.size());
  *len = static_cast<uint32_t>(f.data.size());
  return 0;
}

// All-to-all broadcast of equal-size buffers (`multi.rs:469-525`):
// concurrently send `mine` to every peer and gather everyone's contribution
// into out[n_parties * len], ordered by party id (self included).
int mpcnet_broadcast(void* h, int chan, const uint8_t* mine, uint32_t len,
                     uint8_t* out) {
  auto* net = static_cast<Net*>(h);
  const int n = net->n_parties;
  const int me = net->party_id;
  std::atomic<int> fail{0};
  std::vector<std::thread> senders;
  senders.reserve(n - 1);
  for (int p = 0; p < n; p++) {
    if (p == me) continue;
    senders.emplace_back([&, p] {
      if (send_frame(net, p, chan, mine, len) != 0) fail = 1;
    });
  }
  std::memcpy(out + size_t(me) * len, mine, len);
  for (int p = 0; p < n; p++) {
    if (p == me) continue;
    Frame f;
    if (!recv_frame(net, p, chan, &f) || f.data.size() != len) {
      fail = 1;
      break;
    }
    std::memcpy(out + size_t(p) * len, f.data.data(), len);
  }
  for (auto& t : senders) t.join();
  net->broadcasts += 1;
  return fail ? -1 : 0;
}

// Leader-centric star: workers send to party 0 and receive its reply
// (`mpc-net/src/lib.rs:80-290`).  On the leader, gather fills
// out[n * len]; scatter sends per-party slices.
int mpcnet_gather_to_leader(void* h, int chan, const uint8_t* mine,
                            uint32_t len, uint8_t* out) {
  auto* net = static_cast<Net*>(h);
  if (net->party_id == 0) {
    std::memcpy(out, mine, len);
    for (int p = 1; p < net->n_parties; p++) {
      Frame f;
      if (!recv_frame(net, p, chan, &f) || f.data.size() != len) return -1;
      std::memcpy(out + size_t(p) * len, f.data.data(), len);
    }
    return 0;
  }
  return send_frame(net, 0, chan, mine, len);
}

int mpcnet_scatter_from_leader(void* h, int chan, const uint8_t* all,
                               uint32_t len, uint8_t* mine) {
  auto* net = static_cast<Net*>(h);
  if (net->party_id == 0) {
    std::memcpy(mine, all, len);
    std::atomic<int> fail{0};
    std::vector<std::thread> senders;
    for (int p = 1; p < net->n_parties; p++) {
      senders.emplace_back([&, p] {
        if (send_frame(net, p, chan, all + size_t(p) * len, len) != 0)
          fail = 1;
      });
    }
    for (auto& t : senders) t.join();
    return fail ? -1 : 0;
  }
  uint32_t cap = len;
  return mpcnet_recv(h, 0, chan, mine, &cap);
}

uint64_t mpcnet_bytes_sent(void* h) {
  return static_cast<Net*>(h)->bytes_sent.load();
}
uint64_t mpcnet_bytes_recv(void* h) {
  return static_cast<Net*>(h)->bytes_recv.load();
}
uint64_t mpcnet_num_broadcasts(void* h) {
  return static_cast<Net*>(h)->broadcasts.load();
}

void mpcnet_destroy(void* h) {
  auto* net = static_cast<Net*>(h);
  for (int& fd : net->socks) {
    if (fd >= 0) {
      ::shutdown(fd, SHUT_RDWR);
      ::close(fd);
      fd = -1;
    }
  }
  for (auto& t : net->readers) {
    if (t.joinable()) t.join();
  }
  delete net;
}

}  // extern "C"
