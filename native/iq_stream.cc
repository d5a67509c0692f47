// Native IQ-stream runtime — the host IO components the reference keeps
// in C++ around the DSP (SURVEY.md §2.5 radio_uhd.cc + §2.4 thread
// runtime; PARITY.md gap 7):
//
//   * IqStream: a file-backed sample source with a PREFETCH THREAD
//     filling a lock-free SPSC ring buffer, so host IO overlaps device
//     compute — the role of the UHD RX streamer thread +
//     srslte_ue_sync_zerocopy double buffering (phch_recv.cc:318-358).
//     Timestamps are sample positions (the file radio's hardware clock).
//     Reading past EOF zero-fills and counts "underflows" — the U of the
//     reference's O/U/L counters (ue.cc:271-292).
//
//   * TxQueue: in-order timed-TX commit. Workers submit bursts tagged
//     with a sequence number and an absolute tx_time; bursts are
//     released strictly in sequence order (the reference's tx mutex
//     ring, phch_common.cc:210-240) and a burst whose tx_time has
//     already passed the committed stream head is counted "late" — the
//     L counter (radio_uhd.cc async handler). Gaps between bursts are
//     zero-padded like radio_uhd's burst_settle handling.
//
// Plain C ABI for ctypes (no pybind11 in this image).

#include <atomic>
#include <chrono>
#include <complex>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <map>
#include <thread>
#include <vector>

namespace {

using cf = std::complex<float>;

struct IqStream {
  FILE* f = nullptr;
  std::vector<cf> ring;
  size_t cap = 0;
  // absolute sample indices; head written by reader, tail by consumer
  std::atomic<uint64_t> head{0};
  std::atomic<uint64_t> tail{0};
  std::atomic<bool> eof{false};
  std::atomic<bool> stop{false};
  std::atomic<uint64_t> underflows{0};
  // seek protocol: consumer sets pending_seek, reader drains it
  std::atomic<int64_t> pending_seek{-1};
  uint64_t base = 0;  // absolute sample index of ring position 0's epoch
  std::mutex m;
  std::condition_variable cv_space, cv_data;
  std::thread reader;
  uint32_t block = 0;

  void run() {
    std::vector<cf> tmp;
    for (;;) {
      if (stop.load(std::memory_order_acquire)) return;
      int64_t sk = pending_seek.exchange(-1, std::memory_order_acq_rel);
      if (sk >= 0) {
        std::lock_guard<std::mutex> lk(m);
        ::fseek(f, sk * (long)sizeof(cf), SEEK_SET);
        head.store((uint64_t)sk, std::memory_order_release);
        tail.store((uint64_t)sk, std::memory_order_release);
        eof.store(false, std::memory_order_release);
        cv_data.notify_all();
      }
      uint64_t h = head.load(std::memory_order_acquire);
      uint64_t t = tail.load(std::memory_order_acquire);
      size_t free_n = cap - (size_t)(h - t);
      if (free_n < block) {
        std::unique_lock<std::mutex> lk(m);
        cv_space.wait_for(lk, std::chrono::milliseconds(50));
        continue;
      }
      tmp.resize(block);
      size_t got = ::fread(tmp.data(), sizeof(cf), block, f);
      if (got > 0) {
        for (size_t i = 0; i < got; ++i) ring[(h + i) % cap] = tmp[i];
        head.store(h + got, std::memory_order_release);
        cv_data.notify_all();
      }
      if (got < block) {
        eof.store(true, std::memory_order_release);
        cv_data.notify_all();
        // park until seek/stop
        std::unique_lock<std::mutex> lk(m);
        cv_space.wait_for(lk, std::chrono::milliseconds(50));
      }
    }
  }
};

struct TxBurst {
  int64_t tx_time;
  std::vector<cf> iq;
};

struct TxQueue {
  std::mutex m;
  std::map<int64_t, TxBurst> pending;  // keyed by sequence number
  int64_t next_seq = 0;
  int64_t stream_head = 0;  // absolute sample time committed so far
  uint64_t late = 0;
  uint64_t committed = 0;
  std::vector<cf> out;      // committed waveform (zero-padded gaps)
  int64_t out_t0 = -1;      // absolute time of out[0]
};

}  // namespace

extern "C" {

// ---------------------------------------------------------------- IqStream
void* iqstream_open(const char* path, uint64_t ring_capacity,
                    uint32_t block) {
  FILE* f = ::fopen(path, "rb");
  if (!f) return nullptr;
  auto* s = new IqStream();
  s->f = f;
  s->cap = ring_capacity;
  s->ring.resize(ring_capacity);
  s->block = block ? block : 4096;
  s->reader = std::thread([s] { s->run(); });
  return s;
}

// Blocking read of n samples into out (float pairs). Returns the number
// of REAL samples delivered (rest zero-filled => underflow/EOF).
// *pos_out receives the absolute sample index of out[0].
int64_t iqstream_read(void* h, float* out, int64_t n, int64_t* pos_out) {
  auto* s = static_cast<IqStream*>(h);
  uint64_t t = s->tail.load(std::memory_order_acquire);
  if (pos_out) *pos_out = (int64_t)t;
  int64_t got = 0;
  cf* o = reinterpret_cast<cf*>(out);
  while (got < n) {
    uint64_t hd = s->head.load(std::memory_order_acquire);
    if (hd > t + got) {
      int64_t avail = (int64_t)(hd - (t + got));
      int64_t take = avail < (n - got) ? avail : (n - got);
      for (int64_t i = 0; i < take; ++i)
        o[got + i] = s->ring[(t + got + i) % s->cap];
      got += take;
      // advance tail as we consume so the reader can refill while a
      // larger-than-ring request is in progress (no rendezvous deadlock)
      s->tail.store(t + got, std::memory_order_release);
      s->cv_space.notify_all();
      continue;
    }
    if (s->eof.load(std::memory_order_acquire)) break;
    std::unique_lock<std::mutex> lk(s->m);
    s->cv_data.wait_for(lk, std::chrono::milliseconds(50));
  }
  if (got < n) {
    std::memset(o + got, 0, sizeof(cf) * (size_t)(n - got));
    s->underflows.fetch_add(1, std::memory_order_relaxed);
  }
  s->tail.store(t + n, std::memory_order_release);
  s->cv_space.notify_all();
  return got;
}

int iqstream_seek(void* h, int64_t sample_pos) {
  auto* s = static_cast<IqStream*>(h);
  s->pending_seek.store(sample_pos, std::memory_order_release);
  s->cv_space.notify_all();
  // wait until the reader acknowledges (head/tail repositioned)
  for (int i = 0; i < 2000; ++i) {
    if (s->pending_seek.load(std::memory_order_acquire) < 0 &&
        s->tail.load(std::memory_order_acquire) == (uint64_t)sample_pos)
      return 1;
    std::this_thread::sleep_for(std::chrono::microseconds(100));
  }
  return 0;
}

uint64_t iqstream_underflows(void* h) {
  return static_cast<IqStream*>(h)->underflows.load();
}

void iqstream_close(void* h) {
  auto* s = static_cast<IqStream*>(h);
  s->stop.store(true, std::memory_order_release);
  s->cv_space.notify_all();
  s->reader.join();
  ::fclose(s->f);
  delete s;
}

// ----------------------------------------------------------------- TxQueue
void* txq_create() { return new TxQueue(); }

// Submit burst `seq` for absolute time tx_time. Bursts commit strictly
// in seq order regardless of submission order. Returns the number of
// bursts committed by this call.
int64_t txq_submit(void* h, int64_t seq, int64_t tx_time, const float* iq,
                   int64_t n) {
  auto* q = static_cast<TxQueue*>(h);
  std::lock_guard<std::mutex> lk(q->m);
  TxBurst b;
  b.tx_time = tx_time;
  b.iq.assign(reinterpret_cast<const cf*>(iq),
              reinterpret_cast<const cf*>(iq) + n);
  q->pending.emplace(seq, std::move(b));
  int64_t n_committed = 0;
  for (auto it = q->pending.find(q->next_seq); it != q->pending.end();
       it = q->pending.find(q->next_seq)) {
    TxBurst& burst = it->second;
    int64_t t0 = burst.tx_time;
    if (q->out_t0 < 0) {
      q->out_t0 = t0;
      q->stream_head = t0;
    }
    if (t0 < q->stream_head) {  // missed its slot: late
      ++q->late;
      t0 = q->stream_head;
    }
    // zero-pad the gap (burst start padding, radio_uhd.cc:128-169)
    size_t need = (size_t)(t0 - q->out_t0) + burst.iq.size();
    if (q->out.size() < need) q->out.resize(need, cf(0.0f, 0.0f));
    std::memcpy(q->out.data() + (t0 - q->out_t0), burst.iq.data(),
                burst.iq.size() * sizeof(cf));
    q->stream_head = t0 + (int64_t)burst.iq.size();
    q->pending.erase(it);
    ++q->next_seq;
    ++q->committed;
    ++n_committed;
  }
  return n_committed;
}

uint64_t txq_late(void* h) { return static_cast<TxQueue*>(h)->late; }
uint64_t txq_committed(void* h) { return static_cast<TxQueue*>(h)->committed; }
int64_t txq_stream_len(void* h) {
  auto* q = static_cast<TxQueue*>(h);
  std::lock_guard<std::mutex> lk(q->m);
  return (int64_t)q->out.size();
}
int64_t txq_stream_t0(void* h) {
  return static_cast<TxQueue*>(h)->out_t0;
}

// Copy the committed waveform [offset, offset+n) (relative to out_t0).
int64_t txq_read_stream(void* h, int64_t offset, float* out, int64_t n) {
  auto* q = static_cast<TxQueue*>(h);
  std::lock_guard<std::mutex> lk(q->m);
  if (offset < 0 || (size_t)offset >= q->out.size()) return 0;
  int64_t take = (int64_t)q->out.size() - offset;
  if (take > n) take = n;
  std::memcpy(out, q->out.data() + offset, (size_t)take * sizeof(cf));
  return take;
}

void txq_destroy(void* h) { delete static_cast<TxQueue*>(h); }

}  // extern "C"
