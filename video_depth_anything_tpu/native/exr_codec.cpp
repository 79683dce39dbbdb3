// Native EXR scanline codec: OpenEXR ZIP/ZIPS compression pipeline
// (byte reorder + delta predictor + deflate) and batched single-channel
// float writer. Replaces the OpenEXR bindings the reference depends on
// (run.py:64-77) — this image has none — with a self-contained C++ path;
// utils/exr.py falls back to pure-Python uncompressed EXR when this
// library isn't built.
//
// Build: g++ -O3 -shared -fPIC exr_codec.cpp -o libvda_native.so -lz
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>
#include <zlib.h>

namespace {

constexpr int32_t kMagic = 20000630;
constexpr int32_t kPixelFloat = 2;

// OpenEXR ImfZip.cpp compress(): split bytes into two halves (even/odd
// interleave), then in-place delta predictor, then deflate.
void exr_reorder_predict(const uint8_t* src, size_t n, uint8_t* tmp) {
  uint8_t* t1 = tmp;
  uint8_t* t2 = tmp + (n + 1) / 2;
  const uint8_t* in = src;
  const uint8_t* stop = src + n;
  while (true) {
    if (in < stop) *(t1++) = *(in++); else break;
    if (in < stop) *(t2++) = *(in++); else break;
  }
  uint8_t* t = tmp + 1;
  uint8_t* tend = tmp + n;
  int p = tmp[0];
  while (t < tend) {
    int d = int(t[0]) - p + (128 + 256);
    p = t[0];
    t[0] = uint8_t(d);
    ++t;
  }
}

// Inverse: inflate happens outside; here un-predict then interleave.
void exr_unpredict_interleave(uint8_t* tmp, size_t n, uint8_t* dst) {
  uint8_t* t = tmp + 1;
  uint8_t* tend = tmp + n;
  while (t < tend) {
    int d = int(t[-1]) + int(t[0]) - 128;
    t[0] = uint8_t(d);
    ++t;
  }
  const uint8_t* t1 = tmp;
  const uint8_t* t2 = tmp + (n + 1) / 2;
  uint8_t* out = dst;
  uint8_t* ostop = dst + n;
  while (true) {
    if (out < ostop) *(out++) = *(t1++); else break;
    if (out < ostop) *(out++) = *(t2++); else break;
  }
}

void put_i32(std::string& s, int32_t v) { s.append((const char*)&v, 4); }
void put_u64(std::string& s, uint64_t v) { s.append((const char*)&v, 8); }
void put_f32(std::string& s, float v) { s.append((const char*)&v, 4); }

void attr(std::string& s, const char* name, const char* type,
          const std::string& value) {
  s.append(name); s.push_back('\0');
  s.append(type); s.push_back('\0');
  put_i32(s, (int32_t)value.size());
  s.append(value);
}

}  // namespace

extern "C" {

// Compress one block with the EXR zip pipeline. Returns compressed size,
// or the raw size if compression didn't help (caller then stores raw,
// matching OpenEXR semantics).
int64_t vda_exr_zip(const uint8_t* src, int64_t n, uint8_t* dst,
                    int64_t dst_cap) {
  std::vector<uint8_t> tmp(n);
  exr_reorder_predict(src, (size_t)n, tmp.data());
  uLongf out_len = (uLongf)dst_cap;
  if (compress2(dst, &out_len, tmp.data(), (uLong)n, Z_DEFAULT_COMPRESSION)
      != Z_OK) {
    return -1;
  }
  if ((int64_t)out_len >= n) return n;  // incompressible: store raw
  return (int64_t)out_len;
}

int64_t vda_exr_unzip(const uint8_t* src, int64_t n_src, uint8_t* dst,
                      int64_t n_dst) {
  if (n_src == n_dst) {  // stored raw
    memcpy(dst, src, (size_t)n_dst);
    return n_dst;
  }
  std::vector<uint8_t> tmp(n_dst);
  uLongf out_len = (uLongf)n_dst;
  if (uncompress(tmp.data(), &out_len, src, (uLong)n_src) != Z_OK) return -1;
  if ((int64_t)out_len != n_dst) return -1;
  exr_unpredict_interleave(tmp.data(), (size_t)n_dst, dst);
  return n_dst;
}

// Write depth[h][w] float32 as single-channel "Z" EXR.
// compression: 0 = none, 2 = ZIPS (1 scanline/block), 3 = ZIP (16/block).
int vda_write_exr_z(const char* path, const float* data, int h, int w,
                    int compression) {
  int lines_per_block = compression == 3 ? 16 : 1;
  int n_blocks = compression == 0 ? h : (h + lines_per_block - 1) / lines_per_block;
  if (compression == 0) lines_per_block = 1;

  std::string header;
  {
    std::string ch;
    ch.append("Z"); ch.push_back('\0');
    put_i32(ch, kPixelFloat);
    ch.append(4, '\0');            // pLinear + reserved
    put_i32(ch, 1); put_i32(ch, 1);  // x/y sampling
    ch.push_back('\0');
    attr(header, "channels", "chlist", ch);
  }
  attr(header, "compression", "compression",
       std::string(1, (char)compression));
  {
    std::string box;
    put_i32(box, 0); put_i32(box, 0); put_i32(box, w - 1); put_i32(box, h - 1);
    attr(header, "dataWindow", "box2i", box);
    attr(header, "displayWindow", "box2i", box);
  }
  attr(header, "lineOrder", "lineOrder", std::string(1, '\0'));
  {
    std::string f; put_f32(f, 1.0f);
    attr(header, "pixelAspectRatio", "float", f);
  }
  {
    std::string v; put_f32(v, 0.0f); put_f32(v, 0.0f);
    attr(header, "screenWindowCenter", "v2f", v);
  }
  {
    std::string f; put_f32(f, 1.0f);
    attr(header, "screenWindowWidth", "float", f);
  }
  header.push_back('\0');

  std::string pre;
  put_i32(pre, kMagic);
  put_i32(pre, 2);
  pre.append(header);

  // Compress blocks.
  std::vector<std::string> blocks(n_blocks);
  size_t row_bytes = (size_t)w * 4;
  for (int b = 0; b < n_blocks; ++b) {
    int y0 = b * lines_per_block;
    int nl = std::min(lines_per_block, h - y0);
    size_t raw_n = row_bytes * nl;
    const uint8_t* src = (const uint8_t*)(data + (size_t)y0 * w);
    std::string& blk = blocks[b];
    put_i32(blk, y0);
    if (compression == 0) {
      put_i32(blk, (int32_t)raw_n);
      blk.append((const char*)src, raw_n);
    } else {
      std::vector<uint8_t> out(compressBound((uLong)raw_n));
      int64_t m = vda_exr_zip(src, (int64_t)raw_n, out.data(),
                              (int64_t)out.size());
      if (m < 0) return -2;
      put_i32(blk, (int32_t)m);
      blk.append((const char*)(m == (int64_t)raw_n ? src : out.data()),
                 (size_t)m);
    }
  }

  uint64_t offset = pre.size() + 8ull * n_blocks;
  std::string table;
  for (int b = 0; b < n_blocks; ++b) {
    put_u64(table, offset);
    offset += blocks[b].size();
  }

  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  // Short writes (disk full, I/O error) must fail loudly: a truncated EXR
  // returned as success only surfaces when a downstream consumer parses it.
  bool ok = fwrite(pre.data(), 1, pre.size(), f) == pre.size() &&
            fwrite(table.data(), 1, table.size(), f) == table.size();
  for (auto& blk : blocks)
    ok = ok && fwrite(blk.data(), 1, blk.size(), f) == blk.size();
  ok = (fclose(f) == 0) && ok;  // fclose flushes; order keeps both checks
  if (!ok) { remove(path); return -3; }
  return 0;
}

// Batched writer: paths are '\n'-separated; frames [n][h][w] contiguous.
int vda_write_exr_batch(const char* paths_joined, const float* frames,
                        int n, int h, int w, int compression) {
  std::string all(paths_joined);
  size_t pos = 0;
  for (int i = 0; i < n; ++i) {
    size_t nl = all.find('\n', pos);
    std::string p = all.substr(pos, nl == std::string::npos ? nl : nl - pos);
    int rc = vda_write_exr_z(p.c_str(), frames + (size_t)i * h * w, h, w,
                             compression);
    if (rc != 0) return rc;
    if (nl == std::string::npos) break;
    pos = nl + 1;
  }
  return 0;
}

}  // extern "C"
