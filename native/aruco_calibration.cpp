// ArUco-board camera calibration -> cameras.npz
//
// Native (C++/OpenCV) equivalent of the reference's offline calibration tool
// (reference: data/preprocess_custom_data_colmap_Neus/aruco_preprocess/
// calibration.cpp:11-114): a 20x20 DICT_5X5_1000 marker board at 8-unit
// pitch, scaled so the board diagonal equals raw_scale; images are
// preprocessed by inverting the green channel to grayscale; per-image marker
// detection feeds a global intrinsic calibration, then per-image board pose
// estimation yields world_mat_i = [K [R|t]; 0 0 0 1] written to cameras.npz
// (identity scale_mat — run preprocess_cameras afterwards for the
// unit-sphere normalization).
//
// Usage: aruco_calibration <work_dir> <n_images> <raw_scale>
//   expects <work_dir>/images/000.png ...

#include <cmath>
#include <cstdio>
#include <filesystem>
#include <string>
#include <vector>

#include <opencv2/aruco.hpp>
#include <opencv2/calib3d.hpp>
#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgproc.hpp>

#include "npz.hpp"

int main(int argc, char** argv) {
  if (argc < 4) {
    std::fprintf(stderr, "usage: %s <work_dir> <n_images> <raw_scale>\n", argv[0]);
    return 1;
  }
  std::string work_dir = argv[1];
  int n_images = std::atoi(argv[2]);
  double raw_scale = std::atof(argv[3]);

  const int n_rows = 20, n_cols = 20;
  const double scale = (n_cols * 8 - 1) / (std::sqrt(2.0) * raw_scale);

  // Marker corner coordinates on the board plane (z = 0).
  std::vector<std::vector<cv::Point3f>> obj_points;
  std::vector<int> board_ids;
  for (int x = 0; x < n_rows; x++) {
    for (int y = 0; y < n_cols; y++) {
      double a = (x - n_rows / 2) * 8.0;
      double b = (y - n_cols / 2) * 8.0;
      obj_points.push_back({
          {float(a / scale), float(b / scale), 0.f},
          {float((a + 7) / scale), float(b / scale), 0.f},
          {float((a + 7) / scale), float((b + 7) / scale), 0.f},
          {float(a / scale), float((b + 7) / scale), 0.f},
      });
      board_ids.push_back(x * n_cols + y);
    }
  }

  auto dictionary = cv::aruco::getPredefinedDictionary(cv::aruco::DICT_5X5_1000);
  auto board = cv::aruco::Board::create(obj_points, dictionary, board_ids);
  auto params = cv::aruco::DetectorParameters::create();

  std::vector<std::vector<std::vector<cv::Point2f>>> per_image_corners;
  std::vector<std::vector<int>> per_image_ids;
  std::vector<std::vector<cv::Point2f>> all_corners;
  std::vector<int> all_ids;
  std::vector<int> marker_counts;
  cv::Size img_size;

  for (int i = 0; i < n_images; i++) {
    char name[64];
    std::snprintf(name, sizeof(name), "%03d.png", i);
    cv::Mat img = cv::imread(work_dir + "/images/" + name);
    if (img.empty()) {
      std::fprintf(stderr, "missing image %s\n", name);
      return 1;
    }
    // invert green channel -> grayscale (board printed dark-on-light)
    std::vector<cv::Mat> ch;
    cv::split(img, ch);
    cv::Mat gray;
    cv::subtract(cv::Scalar(255), ch[1], gray);
    img_size = gray.size();

    std::vector<std::vector<cv::Point2f>> corners;
    std::vector<int> ids;
    cv::aruco::detectMarkers(gray, dictionary, corners, ids, params);
    std::printf("image %d: %zu markers\n", i, ids.size());
    per_image_corners.push_back(corners);
    per_image_ids.push_back(ids);
    for (size_t k = 0; k < ids.size(); k++) {
      all_corners.push_back(corners[k]);
      all_ids.push_back(ids[k]);
    }
    marker_counts.push_back(static_cast<int>(ids.size()));
  }

  cv::Mat K, dist;
  std::vector<cv::Mat> rvecs, tvecs;
  double err = cv::aruco::calibrateCameraAruco(
      all_corners, all_ids, marker_counts, board, img_size, K, dist,
      rvecs, tvecs);
  std::printf("calibration reprojection error: %f\n", err);

  npz::Writer wr;
  double Kd[9];
  for (int r = 0; r < 3; r++)
    for (int c = 0; c < 3; c++) Kd[r * 3 + c] = K.at<double>(r, c);
  wr.add("intrinsic", Kd, {3, 3});

  for (int i = 0; i < n_images; i++) {
    cv::Vec3d rvec, tvec;
    int used = cv::aruco::estimatePoseBoard(
        per_image_corners[i], per_image_ids[i], board, K, dist, rvec, tvec);
    if (used == 0) std::fprintf(stderr, "warning: no board pose for image %d\n", i);
    cv::Mat R;
    cv::Rodrigues(rvec, R);
    // world_mat = [K [R|t]; 0 0 0 1]
    double wm[16] = {0};
    for (int r = 0; r < 3; r++) {
      for (int c = 0; c < 3; c++) {
        double acc = 0;
        for (int k = 0; k < 3; k++) acc += K.at<double>(r, k) * R.at<double>(k, c);
        wm[r * 4 + c] = acc;
      }
      double acc = 0;
      for (int k = 0; k < 3; k++) acc += K.at<double>(r, k) * tvec[k];
      wm[r * 4 + 3] = acc;
    }
    wm[15] = 1.0;
    double sm[16] = {1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1};
    wr.add("world_mat_" + std::to_string(i), wm, {4, 4});
    wr.add("scale_mat_" + std::to_string(i), sm, {4, 4});
  }
  std::filesystem::create_directories(work_dir + "/out");
  wr.save(work_dir + "/out/cameras.npz");
  std::printf("wrote %s/out/cameras.npz\n", work_dir.c_str());
  return 0;
}
