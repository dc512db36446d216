// sens_decode — streaming decoder for the ScanNet .sens container.
//
// A from-scratch TPU-era replacement for the reference's vendored
// header-only reader (third_party/SensReader): instead of slurping the
// whole multi-GB container into RAM and keeping every compressed frame
// resident, this decoder streams frame-by-frame with O(frame) memory.
//
// Binary layout (little-endian, version 4; derived from the format the
// reference parser consumes):
//   u32   versionNumber (== 4)
//   u64   sensorNameLen;  char[sensorNameLen]
//   f32[16] colorIntrinsic; f32[16] colorExtrinsic   (row-major 4x4)
//   f32[16] depthIntrinsic; f32[16] depthExtrinsic
//   i32   colorCompression (0 raw, 1 png, 2 jpeg)
//   i32   depthCompression (0 raw_ushort, 1 zlib_ushort, 2 occipital)
//   u32   colorWidth, colorHeight, depthWidth, depthHeight
//   f32   depthShift
//   u64   numFrames
//   per frame:
//     f32[16] cameraToWorld; u64 tsColor, tsDepth
//     u64 colorSizeBytes; u64 depthSizeBytes
//     u8[colorSizeBytes] colorCompressed; u8[depthSizeBytes] depthCompressed
//   u64 numIMUFrames; each 5*3*f64 + u64
//
// Output contract (what the Python data layer reads, see
// neuralrgbd_tpu/data/scannet.py): _info.txt metadata, and — every
// FRAME_INC(=5)th frame, keeping original indices in the names —
// frame-%06d.color.jpg|png (compressed bytes passed through verbatim),
// frame-%06d.depth.pgm (16-bit big-endian binary P5), frame-%06d.pose.txt.
//
// Usage: sens_decode <file.sens> <out_dir> [frame_inc=5]

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <iostream>
#include <sstream>
#include <string>
#include <cerrno>
#include <sys/stat.h>
#include <vector>
#include <zlib.h>

namespace {

struct Header {
  uint32_t version = 0;
  std::string sensor_name;
  float color_intr[16], color_extr[16];
  float depth_intr[16], depth_extr[16];
  int32_t color_comp = -1, depth_comp = -1;
  uint32_t color_w = 0, color_h = 0, depth_w = 0, depth_h = 0;
  float depth_shift = 0.f;
  uint64_t num_frames = 0;
};

template <typename T>
void read_pod(std::istream& in, T* dst, size_t n = 1) {
  in.read(reinterpret_cast<char*>(dst), sizeof(T) * n);
  if (!in) throw std::runtime_error("unexpected EOF in .sens stream");
}

Header read_header(std::istream& in) {
  Header h;
  read_pod(in, &h.version);
  if (h.version != 4)
    throw std::runtime_error("unsupported .sens version " +
                             std::to_string(h.version));
  uint64_t name_len = 0;
  read_pod(in, &name_len);
  if (name_len > (1u << 20)) throw std::runtime_error("bogus sensor name len");
  h.sensor_name.resize(name_len);
  if (name_len) in.read(&h.sensor_name[0], (std::streamsize)name_len);
  read_pod(in, h.color_intr, 16);
  read_pod(in, h.color_extr, 16);
  read_pod(in, h.depth_intr, 16);
  read_pod(in, h.depth_extr, 16);
  read_pod(in, &h.color_comp);
  read_pod(in, &h.depth_comp);
  read_pod(in, &h.color_w);
  read_pod(in, &h.color_h);
  read_pod(in, &h.depth_w);
  read_pod(in, &h.depth_h);
  read_pod(in, &h.depth_shift);
  read_pod(in, &h.num_frames);
  return h;
}

void write_info_txt(const std::string& path, const Header& h) {
  std::ofstream f(path);
  f << "m_versionNumber = " << h.version << "\n";
  f << "m_sensorName = " << h.sensor_name << "\n";
  f << "m_colorWidth = " << h.color_w << "\n";
  f << "m_colorHeight = " << h.color_h << "\n";
  f << "m_depthWidth = " << h.depth_w << "\n";
  f << "m_depthHeight = " << h.depth_h << "\n";
  f << "m_depthShift = " << h.depth_shift << "\n";
  auto mat = [&f](const char* key, const float* m) {
    f << key << " = ";
    for (int i = 0; i < 16; ++i) f << m[i] << " ";
    f << "\n";
  };
  mat("m_calibrationColorIntrinsic", h.color_intr);
  mat("m_calibrationColorExtrinsic", h.color_extr);
  mat("m_calibrationDepthIntrinsic", h.depth_intr);
  mat("m_calibrationDepthExtrinsic", h.depth_extr);
  f << "m_frames.size = " << h.num_frames << "\n";
}

void write_pose_txt(const std::string& path, const float* m /*row-major*/) {
  std::ofstream f(path);
  for (int r = 0; r < 4; ++r) {
    for (int c = 0; c < 4; ++c) {
      f << m[r * 4 + c];
      if (c < 3) f << " ";
    }
    f << "\n";
  }
}

void write_pgm_be16(const std::string& path, uint32_t w, uint32_t h,
                    const std::vector<uint16_t>& data, float depth_shift) {
  std::ofstream f(path, std::ios::binary);
  f << "P5\n# data values are 16-bit each; depth shift is " << depth_shift
    << "\n" << w << " " << h << "\n" << 65535 << "\n";
  std::vector<uint8_t> be(data.size() * 2);
  for (size_t i = 0; i < data.size(); ++i) {
    be[2 * i] = (uint8_t)(data[i] >> 8);
    be[2 * i + 1] = (uint8_t)(data[i] & 0xff);
  }
  f.write(reinterpret_cast<const char*>(be.data()), (std::streamsize)be.size());
}

std::vector<uint16_t> inflate_depth(const std::vector<uint8_t>& comp,
                                    uint32_t w, uint32_t h, int comp_type) {
  const size_t n = (size_t)w * h;
  std::vector<uint16_t> out(n);
  if (comp_type == 0) {  // raw ushort
    if (comp.size() < n * 2) throw std::runtime_error("short raw depth");
    std::memcpy(out.data(), comp.data(), n * 2);
    return out;
  }
  if (comp_type != 1)
    throw std::runtime_error("unsupported depth compression " +
                             std::to_string(comp_type));
  uLongf dst_len = (uLongf)(n * 2);
  int rc = uncompress(reinterpret_cast<Bytef*>(out.data()), &dst_len,
                      comp.data(), (uLong)comp.size());
  if (rc != Z_OK || dst_len != n * 2)
    throw std::runtime_error("zlib inflate failed rc=" + std::to_string(rc));
  return out;
}

std::string frame_stem(const std::string& out_dir, uint64_t idx) {
  char buf[64];
  std::snprintf(buf, sizeof(buf), "frame-%06llu", (unsigned long long)idx);
  return out_dir + "/" + buf;
}

void mkdir_p(const std::string& path) {
  std::string partial;
  std::stringstream ss(path);
  std::string part;
  if (!path.empty() && path[0] == '/') partial = "/";
  while (std::getline(ss, part, '/')) {
    if (part.empty()) continue;
    partial += part + "/";
    if (::mkdir(partial.c_str(), 0755) != 0 && errno != EEXIST)
      throw std::runtime_error("cannot create directory " + partial);
  }
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 3) {
    std::fprintf(stderr, "usage: %s <file.sens> <out_dir> [frame_inc=5]\n",
                 argv[0]);
    return 2;
  }
  const std::string sens_path = argv[1];
  const std::string out_dir = argv[2];
  const uint64_t frame_inc = argc >= 4 ? std::strtoull(argv[3], nullptr, 10)
                                       : 5;
  if (frame_inc == 0) {
    std::fprintf(stderr, "frame_inc must be > 0\n");
    return 2;
  }

  try {
    mkdir_p(out_dir);
    std::ifstream in(sens_path, std::ios::binary);
    if (!in) throw std::runtime_error("cannot open " + sens_path);
    Header h = read_header(in);
    write_info_txt(out_dir + "/_info.txt", h);

    const char* color_ext = h.color_comp == 1 ? ".color.png" : ".color.jpg";
    std::vector<uint8_t> color_buf, depth_buf;

    for (uint64_t i = 0; i < h.num_frames; ++i) {
      float cam_to_world[16];
      uint64_t ts_c, ts_d, color_bytes, depth_bytes;
      read_pod(in, cam_to_world, 16);
      read_pod(in, &ts_c);
      read_pod(in, &ts_d);
      read_pod(in, &color_bytes);
      read_pod(in, &depth_bytes);

      const bool emit = (i % frame_inc) == 0;
      color_buf.resize(color_bytes);
      depth_buf.resize(depth_bytes);
      if (color_bytes) read_pod(in, color_buf.data(), color_bytes);
      if (depth_bytes) read_pod(in, depth_buf.data(), depth_bytes);
      if (!emit) continue;

      const std::string stem = frame_stem(out_dir, i);
      if (h.color_comp == 1 || h.color_comp == 2) {
        // compressed png/jpeg bytes pass through verbatim
        std::ofstream cf(stem + color_ext, std::ios::binary);
        cf.write(reinterpret_cast<const char*>(color_buf.data()),
                 (std::streamsize)color_buf.size());
      } else {
        throw std::runtime_error("raw color frames not supported");
      }
      write_pgm_be16(stem + ".depth.pgm", h.depth_w, h.depth_h,
                     inflate_depth(depth_buf, h.depth_w, h.depth_h,
                                   h.depth_comp),
                     h.depth_shift);
      write_pose_txt(stem + ".pose.txt", cam_to_world);
      if (i % 500 == 0)
        std::fprintf(stderr, "\r[frame %llu / %llu]",
                     (unsigned long long)i, (unsigned long long)h.num_frames);
    }
    std::fprintf(stderr, "\ndecoded %llu frames (every %llu-th) -> %s\n",
                 (unsigned long long)h.num_frames,
                 (unsigned long long)frame_inc, out_dir.c_str());
  } catch (const std::exception& e) {
    std::fprintf(stderr, "error: %s\n", e.what());
    return 1;
  }
  return 0;
}
