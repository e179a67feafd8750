// Baseline JPEG decoder (SOF0, Huffman, 8-bit, grayscale / YCbCr with
// arbitrary sampling factors up to 2x2, restart markers).
//
// The reference decodes overlay JPEGs through CGImageSource
// (metaloverlayrenderer.m:180-264); this environment has no image library,
// so the native runtime ships its own.  JFIF full-range YCbCr -> RGB with
// the standard BT.601 full-range coefficients, matching CoreGraphics.
//
// extern "C" entry: vf_jpeg_decode(data, len, out_rgba, w, h) with a probe
// call (out==null) to learn dimensions first.

#include <cstdint>
#include <cstring>
#include <cmath>

namespace {

struct BitReader {
  const uint8_t* p;
  const uint8_t* end;
  uint32_t bits = 0;
  int count = 0;
  bool marker_hit = false;

  int next_byte() {
    if (p >= end) return -1;
    uint8_t b = *p++;
    if (b == 0xFF) {
      if (p >= end) return -1;
      uint8_t b2 = *p;
      if (b2 == 0x00) {
        ++p;  // stuffed zero
      } else {
        marker_hit = true;  // real marker: stop filling
        --p;                // leave 0xFF for the scan loop
        return -1;
      }
    }
    return b;
  }

  int get_bit() {
    if (count == 0) {
      int b = next_byte();
      if (b < 0) return 0;  // pad with zeros past the end (spec behavior)
      bits = (uint32_t)b;
      count = 8;
    }
    --count;
    return (bits >> count) & 1;
  }

  int get_bits(int n) {
    int v = 0;
    for (int i = 0; i < n; ++i) v = (v << 1) | get_bit();
    return v;
  }

  void align() { count = 0; marker_hit = false; }
};

struct Huff {
  uint8_t counts[17] = {0};
  uint8_t symbols[256] = {0};
  int mincode[17], maxcode[17], valptr[17];
  bool valid = false;

  void build() {
    int code = 0, k = 0;
    for (int l = 1; l <= 16; ++l) {
      valptr[l] = k;
      mincode[l] = code;
      code += counts[l];
      k += counts[l];
      maxcode[l] = code - 1;
      code <<= 1;
    }
    valid = true;
  }

  int decode(BitReader& br) const {
    int code = 0;
    for (int l = 1; l <= 16; ++l) {
      code = (code << 1) | br.get_bit();
      if (counts[l] && code <= maxcode[l]) {
        return symbols[valptr[l] + code - mincode[l]];
      }
    }
    return -1;
  }
};

int extend(int v, int n) {
  return (n && v < (1 << (n - 1))) ? v - (1 << n) + 1 : v;
}

const int kZigzag[64] = {
    0,  1,  8,  16, 9,  2,  3,  10, 17, 24, 32, 25, 18, 11, 4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6,  7,  14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63};

// Simple separable float IDCT (exactness over speed; decode is one-time)
void idct8x8(const int32_t* in, const uint16_t* q, uint8_t* out, int stride) {
  double tmp[64];
  for (int u = 0; u < 64; ++u) tmp[u] = (double)in[u] * q[u];
  double s[64];
  static double cosv[8][8];
  static bool init = false;
  if (!init) {
    for (int x = 0; x < 8; ++x)
      for (int u = 0; u < 8; ++u)
        cosv[x][u] = std::cos((2 * x + 1) * u * M_PI / 16.0) *
                     (u == 0 ? std::sqrt(0.125) : 0.5);
    init = true;
  }
  // rows
  for (int y = 0; y < 8; ++y) {
    for (int x = 0; x < 8; ++x) {
      double acc = 0;
      for (int u = 0; u < 8; ++u) acc += cosv[x][u] * tmp[y * 8 + u];
      s[y * 8 + x] = acc;
    }
  }
  for (int x = 0; x < 8; ++x) {
    for (int y = 0; y < 8; ++y) {
      double acc = 0;
      for (int v = 0; v < 8; ++v) acc += cosv[y][v] * s[v * 8 + x];
      int val = (int)std::lround(acc) + 128;
      out[y * stride + x] = (uint8_t)(val < 0 ? 0 : val > 255 ? 255 : val);
    }
  }
}

struct Component {
  int id = 0, h = 1, v = 1, tq = 0, td = 0, ta = 0;
  uint8_t* plane = nullptr;  // (rows x cols) at component resolution
  int cols = 0, rows = 0;
  int pred = 0;
};

struct Decoder {
  uint16_t qt[4][64] = {};
  Huff hdc[4], hac[4];
  Component comp[3];
  int ncomp = 0, width = 0, height = 0, hmax = 1, vmax = 1;
  int restart_interval = 0;

  ~Decoder() {
    for (auto& c : comp) delete[] c.plane;
  }

  bool decode_block(BitReader& br, Component& c, int bx, int by) {
    int32_t coef[64] = {0};
    const Huff& dc = hdc[c.td];
    const Huff& ac = hac[c.ta];
    if (!dc.valid || !ac.valid) return false;
    int t = dc.decode(br);
    if (t < 0) return false;
    int diff = extend(br.get_bits(t), t);
    c.pred += diff;
    coef[0] = c.pred;
    for (int k = 1; k < 64;) {
      int rs = ac.decode(br);
      if (rs < 0) return false;
      int r = rs >> 4, s = rs & 15;
      if (s == 0) {
        if (r == 15) { k += 16; continue; }
        break;  // EOB
      }
      k += r;
      if (k > 63) return false;
      coef[kZigzag[k]] = extend(br.get_bits(s), s);
      ++k;
    }
    uint8_t block[64];
    idct8x8(coef, qt[c.tq], block, 8);
    int x0 = bx * 8, y0 = by * 8;
    for (int y = 0; y < 8; ++y) {
      int py = y0 + y;
      if (py >= c.rows) break;
      for (int x = 0; x < 8; ++x) {
        int px = x0 + x;
        if (px >= c.cols) break;
        c.plane[py * c.cols + px] = block[y * 8 + x];
      }
    }
    return true;
  }

  int decode(const uint8_t* data, size_t len, uint8_t* out_rgba,
             int* out_w, int* out_h) {
    const uint8_t* p = data;
    const uint8_t* end = data + len;
    if (len < 4 || p[0] != 0xFF || p[1] != 0xD8) return 1;  // not a JPEG
    p += 2;
    while (p + 4 <= end) {
      if (p[0] != 0xFF) return 2;
      uint8_t m = p[1];
      p += 2;
      if (m == 0xD9) break;  // EOI
      if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) continue;
      if (p + 2 > end) return 3;
      int seg = (p[0] << 8) | p[1];
      const uint8_t* sp = p + 2;
      const uint8_t* se = p + seg;
      if (se > end) return 3;
      switch (m) {
        case 0xDB:  // DQT
          while (sp < se) {
            int pq = sp[0] >> 4, tq_i = sp[0] & 15;
            ++sp;
            for (int i = 0; i < 64; ++i) {
              int v = pq ? ((sp[0] << 8) | sp[1]) : sp[0];
              sp += pq ? 2 : 1;
              qt[tq_i][kZigzag[i]] = (uint16_t)v;
            }
          }
          break;
        case 0xC4:  // DHT
          while (sp < se) {
            int tc = sp[0] >> 4, th = sp[0] & 15;
            ++sp;
            Huff& hh = tc ? hac[th] : hdc[th];
            int total = 0;
            for (int i = 1; i <= 16; ++i) {
              hh.counts[i] = sp[i - 1];
              total += hh.counts[i];
            }
            sp += 16;
            for (int i = 0; i < total; ++i) hh.symbols[i] = sp[i];
            sp += total;
            hh.build();
          }
          break;
        case 0xC0: {  // SOF0 baseline
          height = (sp[1] << 8) | sp[2];
          width = (sp[3] << 8) | sp[4];
          ncomp = sp[5];
          if (sp[0] != 8 || ncomp < 1 || ncomp > 3) return 4;
          sp += 6;
          for (int i = 0; i < ncomp; ++i) {
            comp[i].id = sp[0];
            comp[i].h = sp[1] >> 4;
            comp[i].v = sp[1] & 15;
            comp[i].tq = sp[2];
            if (comp[i].h < 1 || comp[i].h > 2 || comp[i].v < 1 ||
                comp[i].v > 2)
              return 5;  // sampling beyond 2x2 unsupported
            sp += 3;
          }
          for (int i = 0; i < ncomp; ++i) {
            hmax = comp[i].h > hmax ? comp[i].h : hmax;
            vmax = comp[i].v > vmax ? comp[i].v : vmax;
          }
          break;
        }
        case 0xC1: case 0xC2: case 0xC3: case 0xC5: case 0xC6: case 0xC7:
        case 0xC9: case 0xCA: case 0xCB: case 0xCD: case 0xCE: case 0xCF:
          return 6;  // non-baseline frame types unsupported
        case 0xDD:  // DRI
          restart_interval = (sp[0] << 8) | sp[1];
          break;
        case 0xDA: {  // SOS
          int ns = sp[0];
          ++sp;
          for (int i = 0; i < ns; ++i) {
            int cid = sp[0], tds = sp[1];
            for (int c = 0; c < ncomp; ++c) {
              if (comp[c].id == cid) {
                comp[c].td = tds >> 4;
                comp[c].ta = tds & 15;
              }
            }
            sp += 2;
          }
          if (width <= 0 || height <= 0) return 7;
          if (out_rgba == nullptr) {
            *out_w = width;
            *out_h = height;
            return 0;  // probe only
          }
          // allocate planes
          int mcux = (width + 8 * hmax - 1) / (8 * hmax);
          int mcuy = (height + 8 * vmax - 1) / (8 * vmax);
          for (int c = 0; c < ncomp; ++c) {
            comp[c].cols = mcux * 8 * comp[c].h;
            comp[c].rows = mcuy * 8 * comp[c].v;
            comp[c].plane = new uint8_t[(size_t)comp[c].cols * comp[c].rows];
            memset(comp[c].plane, 128,
                   (size_t)comp[c].cols * comp[c].rows);
          }
          BitReader br{p + seg, end};
          int mcu = 0;
          for (int my = 0; my < mcuy; ++my) {
            for (int mx = 0; mx < mcux; ++mx) {
              if (restart_interval && mcu && mcu % restart_interval == 0) {
                br.align();
                // skip RSTn marker
                while (br.p + 1 < br.end && br.p[0] == 0xFF &&
                       br.p[1] >= 0xD0 && br.p[1] <= 0xD7)
                  br.p += 2;
                for (int c = 0; c < ncomp; ++c) comp[c].pred = 0;
              }
              for (int c = 0; c < ncomp; ++c) {
                for (int by = 0; by < comp[c].v; ++by) {
                  for (int bx = 0; bx < comp[c].h; ++bx) {
                    if (!decode_block(br, comp[c],
                                      mx * comp[c].h + bx,
                                      my * comp[c].v + by))
                      goto scan_done;  // truncated: keep what we have
                  }
                }
              }
              ++mcu;
            }
          }
        scan_done:
          // color convert (JFIF full-range YCbCr)
          for (int y = 0; y < height; ++y) {
            for (int x = 0; x < width; ++x) {
              uint8_t* px = out_rgba + 4 * ((size_t)y * width + x);
              if (ncomp == 1) {
                uint8_t g =
                    comp[0].plane[(size_t)y * comp[0].cols + x];
                px[0] = px[1] = px[2] = g;
              } else {
                auto samplec = [&](const Component& c) -> int {
                  int cx = x * c.h / hmax;
                  int cy = y * c.v / vmax;
                  if (cx >= c.cols) cx = c.cols - 1;
                  if (cy >= c.rows) cy = c.rows - 1;
                  return c.plane[(size_t)cy * c.cols + cx];
                };
                int Y = samplec(comp[0]);
                int Cb = samplec(comp[1]) - 128;
                int Cr = samplec(comp[2]) - 128;
                auto clamp8 = [](double v) -> uint8_t {
                  return (uint8_t)(v < 0 ? 0 : v > 255 ? 255 : std::lround(v));
                };
                px[0] = clamp8(Y + 1.402 * Cr);
                px[1] = clamp8(Y - 0.344136 * Cb - 0.714136 * Cr);
                px[2] = clamp8(Y + 1.772 * Cb);
              }
              px[3] = 255;
            }
          }
          *out_w = width;
          *out_h = height;
          return 0;
        }
        default:
          break;  // skip APPn/COM/unknown
      }
      p += seg;
    }
    return 8;  // no SOS reached
  }
};

}  // namespace

extern "C" {

// Probe: out_rgba == null -> fills w/h only.  Returns 0 on success.
int vf_jpeg_decode(const uint8_t* data, int64_t len, uint8_t* out_rgba,
                   int32_t* out_w, int32_t* out_h) {
  Decoder d;
  int w = 0, h = 0;
  int rc = d.decode(data, (size_t)len, out_rgba, &w, &h);
  *out_w = w;
  *out_h = h;
  return rc;
}
}
