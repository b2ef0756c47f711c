// Native RGB-D log loader with background prefetch.
//
// TPU-native equivalent of the reference's C++ IO stack
// (GUI/src/Tools/RawLogReader.cpp — .klg zlib/jpeg decode — and
// JPEGLoader.h), built as a small C library consumed from Python via
// ctypes.  A worker thread decodes frames ahead of the consumer into a
// fixed ring of preallocated buffers so the TPU pipeline never stalls on
// host-side decompression (the reference decodes synchronously on the GUI
// thread, GUI/src/HRBF_fusion.cpp:216).
//
// Format (RawLogReader.cpp):
//   int32 numFrames
//   per frame: int64 timestamp, int32 depthSize, int32 imageSize,
//              depth payload (zlib u16 mm or raw), rgb payload (jpeg or raw)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <condition_variable>
#include <mutex>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <zlib.h>

namespace {

struct Frame {
  int64_t timestamp = 0;
  std::vector<float> depth;  // meters
  std::vector<float> rgb;    // [0,1] interleaved
  bool valid = false;
};

struct Loader {
  FILE* f = nullptr;
  int width = 0, height = 0;
  float depth_scale = 1.0f / 1000.0f;
  int32_t num_frames = 0;
  int32_t read_cursor = 0;

  static constexpr int kRing = 4;
  Frame ring[kRing];
  int produced = 0, consumed = 0;
  bool eof = false, stop = false;
  std::mutex mu;
  std::condition_variable cv_produce, cv_consume;
  std::thread worker;

  std::vector<uint8_t> dbuf, ibuf;
  std::vector<uint16_t> depth_u16;

  bool decode_next(Frame& out);
  void run();
};

bool decode_jpeg(const uint8_t* data, size_t size, int w, int h, float* out) {
  jpeg_decompress_struct cinfo;
  jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), size);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  if ((int)cinfo.output_width != w || (int)cinfo.output_height != h) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  std::vector<uint8_t> row(w * 3);
  for (int y = 0; y < h; ++y) {
    uint8_t* rp = row.data();
    jpeg_read_scanlines(&cinfo, &rp, 1);
    float* o = out + (size_t)y * w * 3;
    for (int i = 0; i < w * 3; ++i) o[i] = row[i] * (1.0f / 255.0f);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

bool Loader::decode_next(Frame& out) {
  if (read_cursor >= num_frames) return false;
  int64_t ts;
  int32_t dsize, isize;
  if (fread(&ts, 8, 1, f) != 1) return false;
  if (fread(&dsize, 4, 1, f) != 1) return false;
  if (fread(&isize, 4, 1, f) != 1) return false;
  dbuf.resize(dsize);
  ibuf.resize(isize);
  if (dsize && fread(dbuf.data(), 1, dsize, f) != (size_t)dsize) return false;
  if (isize && fread(ibuf.data(), 1, isize, f) != (size_t)isize) return false;
  ++read_cursor;

  const size_t raw_depth = (size_t)width * height * 2;
  const size_t raw_rgb = (size_t)width * height * 3;
  out.timestamp = ts;
  out.depth.resize((size_t)width * height);
  out.rgb.assign(raw_rgb, 0.0f);
  depth_u16.resize((size_t)width * height);

  if ((size_t)dsize == raw_depth) {
    memcpy(depth_u16.data(), dbuf.data(), raw_depth);
  } else {
    uLongf dest_len = raw_depth;
    if (uncompress(reinterpret_cast<Bytef*>(depth_u16.data()), &dest_len,
                   dbuf.data(), dsize) != Z_OK)
      return false;
  }
  for (size_t i = 0; i < out.depth.size(); ++i)
    out.depth[i] = depth_u16[i] * depth_scale;

  if ((size_t)isize == raw_rgb) {
    for (size_t i = 0; i < raw_rgb; ++i) out.rgb[i] = ibuf[i] * (1.0f / 255.0f);
  } else if (isize > 0) {
    if (!decode_jpeg(ibuf.data(), isize, width, height, out.rgb.data()))
      return false;
  }
  out.valid = true;
  return true;
}

void Loader::run() {
  for (;;) {
    Frame local;
    bool ok = decode_next(local);
    std::unique_lock<std::mutex> lk(mu);
    if (!ok) {
      eof = true;
      cv_consume.notify_all();
      return;
    }
    cv_produce.wait(lk, [&] { return stop || produced - consumed < kRing; });
    if (stop) return;
    ring[produced % kRing] = std::move(local);
    ++produced;
    cv_consume.notify_all();
  }
}

}  // namespace

extern "C" {

void* klg_open(const char* path, int width, int height, float depth_scale) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  auto* l = new Loader();
  l->f = f;
  l->width = width;
  l->height = height;
  l->depth_scale = depth_scale;
  if (fread(&l->num_frames, 4, 1, f) != 1) {
    fclose(f);
    delete l;
    return nullptr;
  }
  l->worker = std::thread([l] { l->run(); });
  return l;
}

int klg_num_frames(void* h) { return static_cast<Loader*>(h)->num_frames; }

// Returns 1 on success, 0 at end of stream.
int klg_next(void* h, float* depth_out, float* rgb_out, int64_t* ts_out) {
  auto* l = static_cast<Loader*>(h);
  std::unique_lock<std::mutex> lk(l->mu);
  l->cv_consume.wait(lk, [&] { return l->eof || l->produced > l->consumed; });
  if (l->produced == l->consumed && l->eof) return 0;
  Frame& fr = l->ring[l->consumed % Loader::kRing];
  memcpy(depth_out, fr.depth.data(), fr.depth.size() * sizeof(float));
  memcpy(rgb_out, fr.rgb.data(), fr.rgb.size() * sizeof(float));
  *ts_out = fr.timestamp;
  ++l->consumed;
  l->cv_produce.notify_all();
  return 1;
}

void klg_close(void* h) {
  auto* l = static_cast<Loader*>(h);
  {
    std::lock_guard<std::mutex> lk(l->mu);
    l->stop = true;
  }
  l->cv_produce.notify_all();
  if (l->worker.joinable()) l->worker.join();
  fclose(l->f);
  delete l;
}

}  // extern "C"
