// ArUco board camera calibration (native tool).
//
// Capability parity with geo/NeuS-ours2/preprocess_custom_data/
// aruco_preprocess/calibration.cpp: a 20x20 DICT_5X5_1000 marker board
// (marker pitch 8 units, 7-unit markers) scaled so the board diagonal
// matches raw_scale; input frames are preprocessed by inverting the green
// channel into grayscale (the reference's capture rig prints the board in
// green); per-frame marker detection feeds calibrateCameraAruco; outputs
// poses.npy [N,2,3] (rvec|tvec rows), intrinsic.npy [3,3], and
// undistorted copies of every frame.
//
// Differences from the reference: npy writing is a local minimal
// implementation (no cnpy dependency), and paths/usage are
//   aruco_calibrate <work_dir> <n_images> <raw_scale>
// with the same work_dir layout (images/%03d.png ->
// tmp/{poses.npy,intrinsic.npy,image_for_aruco,image_undistort}).

#include <sys/stat.h>
#include <sys/types.h>

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <fstream>
#include <iostream>
#include <string>
#include <vector>

#include <opencv2/aruco.hpp>
#include <opencv2/opencv.hpp>

namespace {

void WriteNpy(const std::string& path, const double* data,
              const std::vector<size_t>& shape) {
  std::string header = "{'descr': '<f8', 'fortran_order': False, 'shape': (";
  for (size_t i = 0; i < shape.size(); ++i) {
    header += std::to_string(shape[i]);
    if (shape.size() == 1 || i + 1 < shape.size()) header += ",";
    if (i + 1 < shape.size()) header += " ";
  }
  header += "), }";
  size_t unpadded = 10 + header.size() + 1;
  size_t pad = (64 - unpadded % 64) % 64;
  header += std::string(pad, ' ');
  header += '\n';

  std::ofstream f(path, std::ios::binary);
  const char magic[] = "\x93NUMPY\x01\x00";
  f.write(magic, 8);
  uint16_t hlen = static_cast<uint16_t>(header.size());
  f.write(reinterpret_cast<const char*>(&hlen), 2);
  f.write(header.data(), header.size());
  size_t n = 1;
  for (size_t s : shape) n *= s;
  f.write(reinterpret_cast<const char*>(data), n * sizeof(double));
}

std::string FrameName(int i) {
  char buf[16];
  std::snprintf(buf, sizeof(buf), "%03d", i);
  return std::string(buf);
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 4) {
    std::cerr << "usage: aruco_calibrate <work_dir> <n_images> <raw_scale>\n";
    return 1;
  }
  const std::string work_dir = argv[1];
  const int n_images = std::stoi(argv[2]);
  const double raw_scale = std::stod(argv[3]);

  mkdir((work_dir + "/tmp").c_str(), 0755);
  mkdir((work_dir + "/tmp/image_for_aruco").c_str(), 0755);
  mkdir((work_dir + "/tmp/image_undistort").c_str(), 0755);

  constexpr int kRows = 20;
  constexpr int kCols = 20;
  // board diagonal (in 8-unit pitch coordinates) maps to raw_scale
  const double scale = (kCols * 8 - 1) / (std::sqrt(2.0) * raw_scale);

  std::vector<std::vector<cv::Point3f>> obj_points;
  std::vector<int> board_ids;
  for (int x = 0; x < kRows; ++x) {
    for (int y = 0; y < kCols; ++y) {
      const double a = (x - kRows / 2) * 8;
      const double b = (y - kCols / 2) * 8;
      obj_points.push_back({
          cv::Point3f(a / scale, b / scale, 0.f),
          cv::Point3f((a + 7) / scale, b / scale, 0.f),
          cv::Point3f((a + 7) / scale, (b + 7) / scale, 0.f),
          cv::Point3f(a / scale, (b + 7) / scale, 0.f),
      });
      board_ids.push_back(x * kCols + y);
    }
  }

  auto parameters = cv::aruco::DetectorParameters::create();
  auto dictionary =
      cv::aruco::getPredefinedDictionary(cv::aruco::DICT_5X5_1000);
  auto board = cv::aruco::Board::create(obj_points, dictionary, board_ids);

  std::vector<std::vector<cv::Point2f>> corners_all;
  std::vector<int> ids_all;
  std::vector<int> count_per_frame;
  cv::Size img_size;

  for (int i = 0; i < n_images; ++i) {
    const std::string name = FrameName(i);
    cv::Mat img = cv::imread(work_dir + "/images/" + name + ".png");
    if (img.empty()) {
      std::cerr << "missing frame " << name << "\n";
      return 1;
    }
    // green-channel inversion -> grayscale (board printed in green)
    for (int r = 0; r < img.rows; ++r) {
      auto* px = img.ptr<cv::Vec3b>(r);
      for (int c = 0; c < img.cols; ++c) {
        const uint8_t v = 255 - px[c][1];
        px[c] = cv::Vec3b(v, v, v);
      }
    }
    cv::imwrite(work_dir + "/tmp/image_for_aruco/" + name + ".png", img);
    img_size = img.size();

    std::vector<int> ids;
    std::vector<std::vector<cv::Point2f>> corners, rejected;
    cv::aruco::detectMarkers(img, dictionary, corners, ids, parameters,
                             rejected);
    std::cout << "frame " << name << ": " << ids.size() << " markers\n";
    for (auto& c : corners) corners_all.push_back(c);
    for (int id : ids) ids_all.push_back(id);
    count_per_frame.push_back(static_cast<int>(ids.size()));
  }

  cv::Mat camera_matrix, dist_coeffs;
  std::vector<cv::Mat> rvecs, tvecs;
  const double rep_error = cv::aruco::calibrateCameraAruco(
      corners_all, ids_all, count_per_frame, board, img_size, camera_matrix,
      dist_coeffs, rvecs, tvecs);
  std::cout << "reprojection error: " << rep_error << "\n"
            << camera_matrix << "\n"
            << dist_coeffs << "\n";

  std::vector<double> poses(static_cast<size_t>(n_images) * 6);
  for (int i = 0; i < n_images; ++i) {
    for (int j = 0; j < 3; ++j) {
      poses[i * 6 + j] = rvecs[i].at<double>(j, 0);
      poses[i * 6 + 3 + j] = tvecs[i].at<double>(j, 0);
    }
  }
  std::vector<double> intrinsic(9);
  for (int i = 0; i < 9; ++i) {
    intrinsic[i] = camera_matrix.at<double>(i / 3, i % 3);
  }
  WriteNpy(work_dir + "/tmp/poses.npy", poses.data(),
           {static_cast<size_t>(n_images), 2, 3});
  WriteNpy(work_dir + "/tmp/intrinsic.npy", intrinsic.data(), {3, 3});

  for (int i = 0; i < n_images; ++i) {
    const std::string name = FrameName(i);
    cv::Mat img = cv::imread(work_dir + "/images/" + name + ".png");
    cv::Mat undist;
    cv::undistort(img, undist, camera_matrix, dist_coeffs);
    cv::imwrite(work_dir + "/tmp/image_undistort/" + name + ".png", undist);
  }
  return 0;
}
