// splatloam_tpu native host runtime: hot host-side I/O paths in C++.
//
// The reference offloads its host hot paths to C++ (pyprojections,
// rosbags' C decoders, Open3D); here the TPU compute path is JAX/Pallas and
// this library covers the host data-loader side:
//   * LZF decompression (PCL .pcd binary_compressed codec) — the pure
//     Python fallback is a per-byte loop;
//   * a threaded batch file reader that overlaps disk I/O of upcoming
//     point-cloud files with device compute (KITTI .bin streams).
//
// Build: `make -C native` (produces libsplatloam_native.so, loaded via
// ctypes from splatloam_tpu/io/native.py — pybind11 is not in this image).

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

extern "C" {

// LZF decompression (libLZF-compatible stream format).
// Returns the number of bytes written to out, or -1 on malformed input.
long lzf_decompress(const uint8_t* in, long in_len, uint8_t* out,
                    long out_cap) {
  long ip = 0, op = 0;
  while (ip < in_len) {
    unsigned ctrl = in[ip++];
    if (ctrl < 32) {  // literal run of ctrl+1 bytes
      long run = (long)ctrl + 1;
      if (ip + run > in_len || op + run > out_cap) return -1;
      std::memcpy(out + op, in + ip, run);
      ip += run;
      op += run;
    } else {  // back reference
      long len = ctrl >> 5;
      if (len == 7) {
        if (ip >= in_len) return -1;
        len += in[ip++];
      }
      if (ip >= in_len) return -1;
      long ref = op - (((long)(ctrl & 0x1f) << 8) + in[ip++]) - 1;
      if (ref < 0 || op + len + 2 > out_cap) return -1;
      for (long i = 0; i < len + 2; ++i) {
        out[op] = out[ref];
        ++op;
        ++ref;
      }
    }
  }
  return op;
}

// Threaded batch read: read `n_files` whole files concurrently into the
// caller-provided buffer (each file gets `stride` bytes; short files are
// zero-padded, long files truncated).  Returns per-file byte counts.
void read_files_batch(const char** paths, long n_files, uint8_t* buffer,
                      long stride, long* sizes_out, int n_threads) {
  std::atomic<long> next(0);
  auto worker = [&]() {
    for (;;) {
      long i = next.fetch_add(1);
      if (i >= n_files) return;
      sizes_out[i] = 0;
      FILE* f = std::fopen(paths[i], "rb");
      if (!f) continue;
      long got = (long)std::fread(buffer + i * stride, 1, stride, f);
      std::fclose(f);
      sizes_out[i] = got;
      if (got < stride) std::memset(buffer + i * stride + got, 0,
                                    stride - got);
    }
  };
  if (n_threads < 1) n_threads = 1;
  std::vector<std::thread> threads;
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
}

// Range gate + finite filter for [N, 4] float32 clouds (KITTI bins):
// writes the xyz of points with  rmin < ||p|| <= rmax  to out, returns the
// kept count.  One pass, no temporaries — the Python equivalent
// materializes norms + a boolean mask + a gather.
// LZ4 block decompression (raw block format; overlap-safe byte copies).
static long lz4_block(const uint8_t* in, long in_len, uint8_t* out,
                      long out_cap) {
  const uint8_t* ip = in;
  const uint8_t* iend = in + in_len;
  uint8_t* op = out;
  uint8_t* oend = out + out_cap;
  while (ip < iend) {
    unsigned token = *ip++;
    long lit = token >> 4;
    if (lit == 15) {
      unsigned b;
      do {
        if (ip >= iend) return -1;
        b = *ip++;
        lit += b;
      } while (b == 255);
    }
    if (ip + lit > iend || op + lit > oend) return -1;
    std::memcpy(op, ip, lit);
    ip += lit;
    op += lit;
    if (ip >= iend) break;  // last sequence: literals only
    if (ip + 2 > iend) return -1;
    long offset = (long)ip[0] | ((long)ip[1] << 8);
    ip += 2;
    if (offset == 0 || op - out < offset) return -1;
    long mlen = token & 15;
    if (mlen == 15) {
      unsigned b;
      do {
        if (ip >= iend) return -1;
        b = *ip++;
        mlen += b;
      } while (b == 255);
    }
    mlen += 4;
    if (op + mlen > oend) return -1;
    const uint8_t* src = op - offset;
    for (long i = 0; i < mlen; ++i) op[i] = src[i];  // overlap-safe
    op += mlen;
  }
  return op - out;
}

// LZ4 FRAME decompression (magic 0x184D2204; the format roslz4 and MCAP
// chunks use).  Checksums are skipped (length-validated only).
// Returns bytes written to out, or -1 on malformed input.
long lz4_frame_decompress(const uint8_t* in, long in_len, uint8_t* out,
                          long out_cap) {
  const uint8_t* ip = in;
  const uint8_t* iend = in + in_len;
  if (in_len < 7) return -1;
  uint32_t magic = (uint32_t)ip[0] | ((uint32_t)ip[1] << 8) |
                   ((uint32_t)ip[2] << 16) | ((uint32_t)ip[3] << 24);
  if (magic != 0x184D2204u) return -1;
  ip += 4;
  unsigned flg = *ip++;
  if (((flg >> 6) & 3) != 1) return -1;  // version bits must be 01
  ip++;  // BD byte
  if ((flg >> 3) & 1) ip += 8;  // content size
  if (flg & 1) ip += 4;         // dictionary ID
  ip++;                         // header checksum
  int block_checksum = (flg >> 4) & 1;
  uint8_t* op = out;
  for (;;) {
    if (ip + 4 > iend) return -1;
    uint32_t bsize = (uint32_t)ip[0] | ((uint32_t)ip[1] << 8) |
                     ((uint32_t)ip[2] << 16) | ((uint32_t)ip[3] << 24);
    ip += 4;
    if (bsize == 0) break;  // end mark
    int stored = (bsize >> 31) & 1;
    bsize &= 0x7FFFFFFFu;
    if (ip + bsize > iend) return -1;
    if (stored) {
      if (op + bsize > out + out_cap) return -1;
      std::memcpy(op, ip, bsize);
      op += bsize;
    } else {
      long n = lz4_block(ip, (long)bsize, op, out + out_cap - op);
      if (n < 0) return -1;
      op += n;
    }
    ip += bsize;
    if (block_checksum) ip += 4;
  }
  return op - out;
}

long filter_cloud_f32(const float* xyzi, long n, float rmin, float rmax,
                      float* out_xyz) {
  long kept = 0;
  float rmin2 = rmin * rmin, rmax2 = rmax * rmax;
  for (long i = 0; i < n; ++i) {
    float x = xyzi[4 * i], y = xyzi[4 * i + 1], z = xyzi[4 * i + 2];
    float r2 = x * x + y * y + z * z;
    bool finite = (x == x) && (y == y) && (z == z) &&
                  r2 < 3.4e38f;
    if (finite && r2 > rmin2 && r2 <= rmax2) {
      out_xyz[3 * kept] = x;
      out_xyz[3 * kept + 1] = y;
      out_xyz[3 * kept + 2] = z;
      ++kept;
    }
  }
  return kept;
}

}  // extern "C"
