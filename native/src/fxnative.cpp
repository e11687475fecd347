// FluidX12-TPU native runtime services.
//
// The reference ships its host-side performance services as native binaries
// (XUSG.dll: DDS/BC texture decode; vendored stb_image_write for PNG).  This
// library provides the TPU build's equivalents, exposed through a minimal C
// ABI consumed via ctypes (fluidx12_tpu/utils/native.py):
//
//   fx_decode_bc6h  -- BC6H (DXGI 95/96) block decompression to float32 RGB
//                      (ref capability: XUSGDDSLoader.h:22-39 + XUSG.dll)
//   fx_write_png    -- zlib-compressed PNG encode
//                      (ref capability: stb_image_write.h, FluidX12.cpp:657)
//
// Build: make -C native   (g++ + system zlib only).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <vector>

#include <zlib.h>

extern "C" {

// ---------------------------------------------------------------------------
// BC6H decoding
// ---------------------------------------------------------------------------

#include "bc6h_tables.inc"

namespace {

struct BitReader {
  const uint8_t* data;
  int pos;
  explicit BitReader(const uint8_t* d) : data(d), pos(0) {}
  int bit(int p) const { return (data[p >> 3] >> (p & 7)) & 1; }
  uint32_t read(int n) {
    uint32_t v = 0;
    for (int i = 0; i < n; ++i) v |= uint32_t(bit(pos++)) << i;
    return v;
  }
};

inline int32_t sign_extend(int32_t v, int bits) {
  int32_t s = 1 << (bits - 1);
  return (v ^ s) - s;
}

inline int32_t unq_unsigned(int32_t x, int prec) {
  if (prec >= 15) return x;
  if (x == 0) return 0;
  if (x == ((1 << prec) - 1)) return 0xFFFF;
  return int32_t(((int64_t(x) << 16) + 0x8000) >> prec);
}

inline int32_t unq_signed(int32_t x, int prec) {
  if (prec >= 16) return x;
  bool neg = x < 0;
  int32_t ax = neg ? -x : x;
  int32_t out;
  if (ax == 0) out = 0;
  else if (ax >= (1 << (prec - 1)) - 1) out = 0x7FFF;
  else out = int32_t(((int64_t(ax) << 15) + 0x4000) >> (prec - 1));
  return neg ? -out : out;
}

inline float half_to_float(uint16_t h) {
  uint32_t sign = uint32_t(h & 0x8000) << 16;
  uint32_t exp = (h >> 10) & 0x1F;
  uint32_t man = h & 0x3FF;
  uint32_t f;
  if (exp == 0) {
    if (man == 0) {
      f = sign;
    } else {
      exp = 127 - 15 + 1;
      while (!(man & 0x400)) { man <<= 1; --exp; }
      man &= 0x3FF;
      f = sign | (exp << 23) | (man << 13);
    }
  } else if (exp == 31) {
    f = sign | 0x7F800000u | (man << 13);
  } else {
    f = sign | ((exp + 127 - 15) << 23) | (man << 13);
  }
  float out;
  std::memcpy(&out, &f, 4);
  return out;
}

void decode_block(const uint8_t* blk, int is_signed, float out[16][3]) {
  BitReader br(blk);
  uint32_t m2 = br.read(2);
  uint32_t mode_val = m2;
  if (m2 >= 2) mode_val = m2 | (br.read(3) << 2);

  const ModeInfo* mi = nullptr;
  for (int i = 0; i < kNumModes; ++i)
    if (kModes[i].mode_value == int(mode_val)) { mi = &kModes[i]; break; }
  if (!mi) {  // invalid modes decode to zero (spec behavior)
    std::memset(out, 0, sizeof(float) * 48);
    return;
  }

  // Endpoint fields: rw,gw,bw, rx,gx,bx, ry,gy,by, rz,gz,bz, d
  int32_t fields[13] = {0};
  for (int i = 0; i < mi->layout_len; ++i) {
    const FieldBit& fb = mi->layout[i];
    fields[fb.field] |= int32_t(br.read(1)) << fb.bit;
  }

  int epb = mi->epb;
  int32_t ep[3][4];  // [channel][w,x,y,z]
  for (int ch = 0; ch < 3; ++ch) {
    int32_t w = fields[ch];          // rw/gw/bw
    int32_t x = fields[3 + ch];      // rx/gx/bx
    int32_t y = fields[6 + ch];      // ry/gy/by
    int32_t z = fields[9 + ch];      // rz/gz/bz
    int db = mi->delta_bits[ch];
    if (is_signed) w = sign_extend(w, epb);
    if (mi->transformed) {
      int32_t mask = (1 << epb) - 1;
      x = sign_extend(x, db) + w;
      y = sign_extend(y, db) + w;
      z = sign_extend(z, db) + w;
      if (is_signed) {
        x = sign_extend(x & mask, epb);
        y = sign_extend(y & mask, epb);
        z = sign_extend(z & mask, epb);
      } else {
        x &= mask; y &= mask; z &= mask;
      }
    } else if (is_signed) {
      x = sign_extend(x, db);
      y = sign_extend(y, db);
      z = sign_extend(z, db);
    }
    if (is_signed) {
      ep[ch][0] = unq_signed(w, epb);
      ep[ch][1] = unq_signed(x, epb);
      ep[ch][2] = unq_signed(y, epb);
      ep[ch][3] = unq_signed(z, epb);
    } else {
      ep[ch][0] = unq_unsigned(w, epb);
      ep[ch][1] = unq_unsigned(x, epb);
      ep[ch][2] = unq_unsigned(y, epb);
      ep[ch][3] = unq_unsigned(z, epb);
    }
  }

  int part = fields[12] & 31;
  const int* subset = mi->two_region ? kPartitions2[part] : nullptr;
  int anchor1 = mi->two_region ? kAnchor2[part] : -1;
  const int* weights = mi->two_region ? kWeight3 : kWeight4;
  int nbits = mi->two_region ? 3 : 4;

  for (int t = 0; t < 16; ++t) {
    int ib = nbits - ((t == 0 || t == anchor1) ? 1 : 0);
    uint32_t idx = br.read(ib);
    int w = weights[idx];
    int sub = subset ? subset[t] : 0;
    for (int ch = 0; ch < 3; ++ch) {
      int32_t a = sub == 0 ? ep[ch][0] : ep[ch][2];
      int32_t b = sub == 0 ? ep[ch][1] : ep[ch][3];
      int32_t interp = (a * (64 - w) + b * w + 32) >> 6;
      uint16_t bits16;
      if (is_signed) {
        int32_t ai = interp < 0 ? -interp : interp;
        int32_t fin = (ai * 31) >> 5;
        bits16 = uint16_t(interp < 0 ? (fin | 0x8000) : fin);
      } else {
        bits16 = uint16_t((interp * 31) >> 6);
      }
      out[t][ch] = half_to_float(bits16);
    }
  }
}

}  // namespace

// blocks: bw*bh 16-byte blocks; out: (bh*4, bw*4, 3) float32 row-major.
void fx_decode_bc6h(const uint8_t* blocks, int bw, int bh, int is_signed,
                    float* out) {
  const int stride = bw * 4 * 3;
  for (int by = 0; by < bh; ++by) {
    for (int bx = 0; bx < bw; ++bx) {
      float texels[16][3];
      decode_block(blocks + (by * bw + bx) * 16, is_signed, texels);
      for (int ty = 0; ty < 4; ++ty) {
        float* row = out + (by * 4 + ty) * stride + bx * 4 * 3;
        std::memcpy(row, texels[ty * 4], 4 * 3 * sizeof(float));
      }
    }
  }
}

// ---------------------------------------------------------------------------
// PNG encoding (zlib)
// ---------------------------------------------------------------------------

namespace {

void put_u32_be(std::vector<uint8_t>& v, uint32_t x) {
  v.push_back(uint8_t(x >> 24));
  v.push_back(uint8_t(x >> 16));
  v.push_back(uint8_t(x >> 8));
  v.push_back(uint8_t(x));
}

void write_chunk(FILE* f, const char tag[4], const uint8_t* data, size_t len) {
  uint8_t hdr[8];
  hdr[0] = uint8_t(len >> 24); hdr[1] = uint8_t(len >> 16);
  hdr[2] = uint8_t(len >> 8); hdr[3] = uint8_t(len);
  std::memcpy(hdr + 4, tag, 4);
  fwrite(hdr, 1, 8, f);
  if (len) fwrite(data, 1, len, f);
  uint32_t crc = crc32(0L, Z_NULL, 0);
  crc = crc32(crc, reinterpret_cast<const Bytef*>(tag), 4);
  if (len) crc = crc32(crc, data, static_cast<uInt>(len));
  uint8_t crcb[4] = {uint8_t(crc >> 24), uint8_t(crc >> 16), uint8_t(crc >> 8),
                     uint8_t(crc)};
  fwrite(crcb, 1, 4, f);
}

}  // namespace

// Returns 1 on success. comp must be 3 or 4; stride in bytes.
int fx_write_png(const char* path, const uint8_t* pixels, int w, int h,
                 int comp, int stride) {
  if (comp != 3 && comp != 4) return 0;
  FILE* f = fopen(path, "wb");
  if (!f) return 0;

  static const uint8_t sig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1A, '\n'};
  fwrite(sig, 1, 8, f);

  std::vector<uint8_t> ihdr;
  put_u32_be(ihdr, uint32_t(w));
  put_u32_be(ihdr, uint32_t(h));
  ihdr.push_back(8);                       // bit depth
  ihdr.push_back(comp == 3 ? 2 : 6);       // color type
  ihdr.push_back(0); ihdr.push_back(0); ihdr.push_back(0);
  write_chunk(f, "IHDR", ihdr.data(), ihdr.size());

  // Raw scanlines with filter byte 0 (matches the Python fallback).
  std::vector<uint8_t> raw(size_t(h) * (size_t(w) * comp + 1));
  for (int y = 0; y < h; ++y) {
    uint8_t* dst = raw.data() + size_t(y) * (size_t(w) * comp + 1);
    dst[0] = 0;
    std::memcpy(dst + 1, pixels + size_t(y) * stride, size_t(w) * comp);
  }
  uLongf zlen = compressBound(static_cast<uLong>(raw.size()));
  std::vector<uint8_t> zdata(zlen);
  if (compress2(zdata.data(), &zlen, raw.data(),
                static_cast<uLong>(raw.size()), 6) != Z_OK) {
    fclose(f);
    return 0;
  }
  write_chunk(f, "IDAT", zdata.data(), zlen);
  write_chunk(f, "IEND", nullptr, 0);
  fclose(f);
  return 1;
}

}  // extern "C"
