// mdet_hostio: native host-side frame pipeline for the TPU inference runtime.
//
// Role in the framework: the host-side counterpart of the reference's pinned
// -buffer CUDA runtime (reference common_runtime.py:43-89) and its Python
// capture thread (reference Depth_Pro/onnx2trt_webcam.py:117-180). Frame
// acquisition, JPEG/PNG/video decode, BGR->RGB conversion and resize run in
// native threads on preallocated stable buffers, fully off the Python GIL;
// Python wraps the buffers zero-copy (numpy frombuffer) and ships them to
// the TPU with device_put.
//
// C ABI (ctypes-friendly); see monocular_depth_estimation_trt_tpu/runtime/native.py.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <map>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <opencv2/core.hpp>
#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgproc.hpp>
#include <opencv2/videoio.hpp>

namespace {

struct Slot {
  std::vector<uint8_t> data;  // RGB, out_h * out_w * 3
  int64_t frame_index = -1;
  double timestamp = 0.0;
};

struct FramePump {
  int out_w = 0, out_h = 0;
  int ring = 0;
  std::vector<Slot> slots;

  std::mutex mu;
  std::condition_variable cv_ready;   // consumer waits for ready frames
  std::condition_variable cv_free;    // producers wait for free slots
  std::deque<int> free_slots;         // indices into slots
  std::map<int64_t, int> ready;       // frame_index -> slot (ordered delivery)
  int64_t next_emit = 0;              // next frame index to hand out
  int64_t next_decode = 0;            // next frame index to decode (images mode)
  std::atomic<int64_t> decoded{0};
  std::atomic<bool> done{false};
  std::atomic<bool> stop{false};

  std::vector<std::string> paths;     // images mode
  std::string video_path;             // video mode
  std::vector<std::thread> workers;
  std::atomic<int> active_workers{0};
};

void decode_into(FramePump* p, const cv::Mat& bgr, int slot_idx, int64_t index) {
  cv::Mat rgb;
  cv::cvtColor(bgr, rgb, cv::COLOR_BGR2RGB);
  if (rgb.cols != p->out_w || rgb.rows != p->out_h) {
    cv::Mat resized;
    cv::resize(rgb, resized, cv::Size(p->out_w, p->out_h), 0, 0, cv::INTER_LINEAR);
    rgb = resized;
  }
  Slot& s = p->slots[slot_idx];
  if (!rgb.isContinuous()) rgb = rgb.clone();
  std::memcpy(s.data.data(), rgb.data, (size_t)p->out_w * p->out_h * 3);
  s.frame_index = index;
  s.timestamp = (double)cv::getTickCount() / cv::getTickFrequency();
}

int take_free_slot(FramePump* p) {
  std::unique_lock<std::mutex> lk(p->mu);
  p->cv_free.wait(lk, [&] { return p->stop || !p->free_slots.empty(); });
  if (p->stop) return -1;
  int s = p->free_slots.front();
  p->free_slots.pop_front();
  return s;
}

void publish(FramePump* p, int slot_idx, int64_t index) {
  {
    std::lock_guard<std::mutex> lk(p->mu);
    p->ready[index] = slot_idx;
  }
  p->decoded.fetch_add(1);
  p->cv_ready.notify_all();
}

void image_worker(FramePump* p) {
  for (;;) {
    // IMPORTANT ordering: reserve a ring slot BEFORE claiming a frame
    // index. Claiming the index first can deadlock: all slots get held by
    // newer frames while the consumer waits on an older frame whose worker
    // blocks forever on a free slot the consumer will never release.
    int slot = take_free_slot(p);
    if (slot < 0) break;  // stopping
    int64_t index;
    {
      std::lock_guard<std::mutex> lk(p->mu);
      if (p->stop || p->next_decode >= (int64_t)p->paths.size()) {
        p->free_slots.push_back(slot);  // give the slot back
        p->cv_free.notify_one();
        break;
      }
      index = p->next_decode++;
    }
    cv::Mat bgr = cv::imread(p->paths[index], cv::IMREAD_COLOR);
    if (bgr.empty()) {
      // publish a black frame rather than stalling the ordered stream
      cv::Mat black(p->out_h, p->out_w, CV_8UC3, cv::Scalar(0, 0, 0));
      decode_into(p, black, slot, index);
    } else {
      decode_into(p, bgr, slot, index);
    }
    publish(p, slot, index);
  }
  // the LAST worker to exit marks the stream done (every earlier exiter's
  // frames are already published because publish happens before exit)
  if (p->active_workers.fetch_sub(1) == 1) {
    std::lock_guard<std::mutex> lk(p->mu);
    p->done = true;
    p->cv_ready.notify_all();
  }
}

void video_worker(FramePump* p) {
  cv::VideoCapture cap(p->video_path);
  int64_t index = 0;
  if (cap.isOpened()) {
    cv::Mat bgr;
    while (!p->stop && cap.read(bgr)) {
      int slot = take_free_slot(p);
      if (slot < 0) break;
      decode_into(p, bgr, slot, index);
      publish(p, slot, index);
      ++index;
    }
  }
  p->done = true;
  p->cv_ready.notify_all();
}

}  // namespace

extern "C" {

FramePump* mdet_pump_create_images(const char** paths, int n, int ring,
                                   int out_w, int out_h, int n_threads) {
  auto* p = new FramePump();
  p->out_w = out_w;
  p->out_h = out_h;
  p->ring = ring;
  p->slots.resize(ring);
  for (int i = 0; i < ring; ++i) {
    p->slots[i].data.resize((size_t)out_w * out_h * 3);
    p->free_slots.push_back(i);
  }
  for (int i = 0; i < n; ++i) p->paths.emplace_back(paths[i]);
  if (n_threads < 1) n_threads = 1;
  p->active_workers = n_threads;
  for (int i = 0; i < n_threads; ++i)
    p->workers.emplace_back(image_worker, p);
  return p;
}

FramePump* mdet_pump_create_video(const char* path, int ring, int out_w,
                                  int out_h) {
  auto* p = new FramePump();
  p->out_w = out_w;
  p->out_h = out_h;
  p->ring = ring;
  p->slots.resize(ring);
  for (int i = 0; i < ring; ++i) {
    p->slots[i].data.resize((size_t)out_w * out_h * 3);
    p->free_slots.push_back(i);
  }
  p->video_path = path;
  p->workers.emplace_back(video_worker, p);
  return p;
}

// Returns slot id >= 0 with *data pointing at the RGB buffer; -1 on end of
// stream; -2 on timeout. Ordered: frames come out in source order.
int mdet_pump_acquire(FramePump* p, uint8_t** data, int64_t* frame_index,
                      double timeout_s) {
  std::unique_lock<std::mutex> lk(p->mu);
  auto pred = [&] {
    return p->stop || p->ready.count(p->next_emit) || (p->done && p->ready.empty());
  };
  if (!p->cv_ready.wait_for(lk, std::chrono::duration<double>(timeout_s), pred))
    return -2;
  if (p->stop) return -1;
  auto it = p->ready.find(p->next_emit);
  if (it == p->ready.end()) {
    if (p->done && p->ready.empty()) return -1;
    return -2;
  }
  int slot = it->second;
  p->ready.erase(it);
  p->next_emit++;
  *data = p->slots[slot].data.data();
  *frame_index = p->slots[slot].frame_index;
  return slot;
}

void mdet_pump_release(FramePump* p, int slot) {
  {
    std::lock_guard<std::mutex> lk(p->mu);
    p->free_slots.push_back(slot);
  }
  p->cv_free.notify_one();
}

int64_t mdet_pump_decoded(FramePump* p) { return p->decoded.load(); }

void mdet_pump_destroy(FramePump* p) {
  p->stop = true;
  p->cv_free.notify_all();
  p->cv_ready.notify_all();
  for (auto& t : p->workers)
    if (t.joinable()) t.join();
  delete p;
}

// Single-shot: decode an image file to RGB at (out_w, out_h). Returns 0 on
// success.
int mdet_decode_resize(const char* path, uint8_t* out, int out_w, int out_h) {
  cv::Mat bgr = cv::imread(path, cv::IMREAD_COLOR);
  if (bgr.empty()) return 1;
  cv::Mat rgb;
  cv::cvtColor(bgr, rgb, cv::COLOR_BGR2RGB);
  cv::Mat resized;
  cv::resize(rgb, resized, cv::Size(out_w, out_h), 0, 0, cv::INTER_LINEAR);
  if (!resized.isContinuous()) resized = resized.clone();
  std::memcpy(out, resized.data, (size_t)out_w * out_h * 3);
  return 0;
}

// Turbo-colormap + JPEG encode on the host output path (depth viz write,
// reference onnx2trt.py:221-241) for callers that want to bypass Python.
int mdet_encode_jpg(const char* path, const uint8_t* rgb, int w, int h,
                    int quality) {
  cv::Mat img(h, w, CV_8UC3, const_cast<uint8_t*>(rgb));
  cv::Mat bgr;
  cv::cvtColor(img, bgr, cv::COLOR_RGB2BGR);
  std::vector<int> params = {cv::IMWRITE_JPEG_QUALITY, quality};
  return cv::imwrite(path, bgr, params) ? 0 : 1;
}

}  // extern "C"
