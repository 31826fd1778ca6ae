// Multithreaded scene loader: decode image/ + mask/ PNGs into caller buffers.
//
// Native runtime component in the data-loading slot (the reference decodes
// images serially with imageio on the Python side, scene_dataset.py:53-63).
// A DTU scan is 49-64 x 1600x1200 PNGs; decoding dominates dataset startup.
// This library decodes with OpenCV across a thread pool directly into the
// pinned numpy buffers passed from Python (see data/native_loader.py).
//
// C ABI:
//   int hmnffb_load_scene(const char** image_paths, const char** mask_paths,
//                         int n_images, int height, int width,
//                         uint8_t* rgb_out,   // (n, H*W, 3)
//                         uint8_t* mask_out,  // (n, H*W)
//                         int n_threads);
// returns 0 on success, else the (1-based) index of the first failing image.

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgproc.hpp>

extern "C" int hmnffb_load_scene(const char** image_paths,
                                 const char** mask_paths, int n_images,
                                 int height, int width, uint8_t* rgb_out,
                                 uint8_t* mask_out, int n_threads) {
  if (n_threads <= 0) n_threads = std::max(1u, std::thread::hardware_concurrency());
  std::atomic<int> next(0), failed(0);
  const size_t hw = static_cast<size_t>(height) * width;

  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n_images || failed.load()) return;
      cv::Mat img = cv::imread(image_paths[i], cv::IMREAD_COLOR);
      if (img.empty() || img.rows != height || img.cols != width) {
        failed.store(i + 1);
        return;
      }
      cv::Mat rgb;
      cv::cvtColor(img, rgb, cv::COLOR_BGR2RGB);
      std::memcpy(rgb_out + i * hw * 3, rgb.data, hw * 3);

      cv::Mat m = cv::imread(mask_paths[i], cv::IMREAD_GRAYSCALE);
      if (m.empty() || m.rows != height || m.cols != width) {
        failed.store(i + 1);
        return;
      }
      uint8_t* dst = mask_out + i * hw;
      const uint8_t* src = m.data;
      for (size_t p = 0; p < hw; p++) dst[p] = src[p] > 127 ? 1 : 0;
    }
  };

  std::vector<std::thread> pool;
  for (int t = 0; t < n_threads; t++) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return failed.load();
}
