// Minimal uncompressed .npz (zip-of-.npy) writer — replaces the cnpy
// dependency of the reference's calibration tool
// (reference: data/preprocess_custom_data_colmap_Neus/aruco_preprocess/calibration.cpp:1).
//
// Writes STORE-method zip entries, each a v1.0 .npy with a little-endian
// float64 C-order array.  Readable by numpy.load().
#pragma once

#include <cstdint>
#include <cstring>
#include <fstream>
#include <string>
#include <vector>

namespace npz {

inline uint32_t crc32(const uint8_t* data, size_t n, uint32_t crc = 0) {
  static uint32_t table[256];
  static bool init = false;
  if (!init) {
    for (uint32_t i = 0; i < 256; i++) {
      uint32_t c = i;
      for (int k = 0; k < 8; k++) c = c & 1 ? 0xEDB88320u ^ (c >> 1) : c >> 1;
      table[i] = c;
    }
    init = true;
  }
  crc = ~crc;
  for (size_t i = 0; i < n; i++) crc = table[(crc ^ data[i]) & 0xFF] ^ (crc >> 8);
  return ~crc;
}

struct Entry {
  std::string name;       // e.g. "world_mat_0.npy"
  std::vector<uint8_t> bytes;
  uint32_t crc = 0;
  uint32_t offset = 0;
};

inline std::vector<uint8_t> npy_bytes(const double* data,
                                      const std::vector<size_t>& shape) {
  std::string header = "{'descr': '<f8', 'fortran_order': False, 'shape': (";
  for (size_t i = 0; i < shape.size(); i++) {
    header += std::to_string(shape[i]);
    if (shape.size() == 1 || i + 1 < shape.size()) header += ", ";
  }
  header += "), }";
  size_t total = 10 + header.size() + 1;
  size_t pad = (64 - total % 64) % 64;
  header += std::string(pad, ' ');
  header += '\n';

  std::vector<uint8_t> out;
  const char magic[] = "\x93NUMPY\x01\x00";
  out.insert(out.end(), magic, magic + 8);
  uint16_t hlen = static_cast<uint16_t>(header.size());
  out.push_back(hlen & 0xFF);
  out.push_back(hlen >> 8);
  out.insert(out.end(), header.begin(), header.end());
  size_t count = 1;
  for (auto s : shape) count *= s;
  const uint8_t* raw = reinterpret_cast<const uint8_t*>(data);
  out.insert(out.end(), raw, raw + count * sizeof(double));
  return out;
}

class Writer {
 public:
  void add(const std::string& array_name, const double* data,
           const std::vector<size_t>& shape) {
    Entry e;
    e.name = array_name + ".npy";
    e.bytes = npy_bytes(data, shape);
    e.crc = crc32(e.bytes.data(), e.bytes.size());
    entries_.push_back(std::move(e));
  }

  void save(const std::string& path) {
    std::ofstream f(path, std::ios::binary);
    auto w16 = [&](uint16_t v) { f.write(reinterpret_cast<char*>(&v), 2); };
    auto w32 = [&](uint32_t v) { f.write(reinterpret_cast<char*>(&v), 4); };

    for (auto& e : entries_) {
      e.offset = static_cast<uint32_t>(f.tellp());
      w32(0x04034b50);           // local file header
      w16(20); w16(0); w16(0);   // version, flags, method=store
      w16(0); w16(0);            // time, date
      w32(e.crc);
      w32(static_cast<uint32_t>(e.bytes.size()));
      w32(static_cast<uint32_t>(e.bytes.size()));
      w16(static_cast<uint16_t>(e.name.size()));
      w16(0);
      f.write(e.name.data(), e.name.size());
      f.write(reinterpret_cast<const char*>(e.bytes.data()), e.bytes.size());
    }
    uint32_t cd_start = static_cast<uint32_t>(f.tellp());
    for (auto& e : entries_) {
      w32(0x02014b50);
      w16(20); w16(20); w16(0); w16(0);
      w16(0); w16(0);
      w32(e.crc);
      w32(static_cast<uint32_t>(e.bytes.size()));
      w32(static_cast<uint32_t>(e.bytes.size()));
      w16(static_cast<uint16_t>(e.name.size()));
      w16(0); w16(0); w16(0); w16(0);
      w32(0);
      w32(e.offset);
      f.write(e.name.data(), e.name.size());
    }
    uint32_t cd_size = static_cast<uint32_t>(f.tellp()) - cd_start;
    w32(0x06054b50);
    w16(0); w16(0);
    w16(static_cast<uint16_t>(entries_.size()));
    w16(static_cast<uint16_t>(entries_.size()));
    w32(cd_size);
    w32(cd_start);
    w16(0);
  }

 private:
  std::vector<Entry> entries_;
};

}  // namespace npz
