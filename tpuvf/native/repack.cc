// tpuvf native runtime helpers: pixel-format repacking + PNG row unfiltering.
//
// The reference's CPU-side hot paths are the GstVideoFrame plane uploads and
// readbacks (replaceRegion/getBytes).  Here the host<->device boundary work
// is interleaved<->planar conversion and macro-pixel (un)packing; numpy does
// these with strided fancy-indexing, which is 5-10x slower than these tight
// loops.  Built as a plain shared library, bound via ctypes (no pybind11).
//
// All functions assume contiguous buffers; shapes validated on the Python
// side.

#include <cstdint>
#include <cstring>

extern "C" {

// (h, w, 4) interleaved -> (4, h, w) planar with a channel permutation:
// dst[c][y][x] = src[y][x][perm[c]]
void vf_interleaved_to_planar(const uint8_t* src, uint8_t* dst,
                              int64_t h, int64_t w, const int32_t* perm) {
  const int64_t n = h * w;
  uint8_t* d0 = dst + (int64_t)0 * n;
  uint8_t* d1 = dst + (int64_t)1 * n;
  uint8_t* d2 = dst + (int64_t)2 * n;
  uint8_t* d3 = dst + (int64_t)3 * n;
  const int p0 = perm[0], p1 = perm[1], p2 = perm[2], p3 = perm[3];
  for (int64_t i = 0; i < n; ++i) {
    const uint8_t* px = src + i * 4;
    d0[i] = px[p0];
    d1[i] = px[p1];
    d2[i] = px[p2];
    d3[i] = px[p3];
  }
}

// (4, h, w) planar -> (h, w, 4) interleaved with inverse permutation:
// dst[y][x][perm[c]] = src[c][y][x]
void vf_planar_to_interleaved(const uint8_t* src, uint8_t* dst,
                              int64_t h, int64_t w, const int32_t* perm) {
  const int64_t n = h * w;
  const uint8_t* s0 = src + (int64_t)0 * n;
  const uint8_t* s1 = src + (int64_t)1 * n;
  const uint8_t* s2 = src + (int64_t)2 * n;
  const uint8_t* s3 = src + (int64_t)3 * n;
  const int p0 = perm[0], p1 = perm[1], p2 = perm[2], p3 = perm[3];
  for (int64_t i = 0; i < n; ++i) {
    uint8_t* px = dst + i * 4;
    px[p0] = s0[i];
    px[p1] = s1[i];
    px[p2] = s2[i];
    px[p3] = s3[i];
  }
}

// interleaved pair stream [a0 b0 a1 b1 ...] -> two planes (NV12 UV split)
void vf_deinterleave2(const uint8_t* src, uint8_t* a, uint8_t* b, int64_t n) {
  for (int64_t i = 0; i < n; ++i) {
    a[i] = src[2 * i];
    b[i] = src[2 * i + 1];
  }
}

void vf_interleave2(const uint8_t* a, const uint8_t* b, uint8_t* dst,
                    int64_t n) {
  for (int64_t i = 0; i < n; ++i) {
    dst[2 * i] = a[i];
    dst[2 * i + 1] = b[i];
  }
}

// (h, w) u8 plane -> four (h/2, w/2) QUAD phase planes (row x col parity):
// ee = src[0::2, 0::2], eo = src[0::2, 1::2], oe = src[1::2, 0::2],
// oo = src[1::2, 1::2].  The quad-link source provisioning
// (core.frame.split_planes_host) — the row+column analog of
// vf_deinterleave2, one pass over the source.
void vf_split_quad(const uint8_t* src, uint8_t* ee, uint8_t* eo, uint8_t* oe,
                   uint8_t* oo, int64_t h, int64_t w) {
  const int64_t h2 = h / 2, w2 = w / 2;
  for (int64_t r = 0; r < h2; ++r) {
    const uint8_t* row_e = src + (2 * r) * w;
    const uint8_t* row_o = src + (2 * r + 1) * w;
    uint8_t* pee = ee + r * w2;
    uint8_t* peo = eo + r * w2;
    uint8_t* poe = oe + r * w2;
    uint8_t* poo = oo + r * w2;
    for (int64_t c = 0; c < w2; ++c) {
      pee[c] = row_e[2 * c];
      peo[c] = row_e[2 * c + 1];
      poe[c] = row_o[2 * c];
      poo[c] = row_o[2 * c + 1];
    }
  }
}

// four (h2, w2) u32 word planes -> (2*h2, 2*w2) u32 interleaved (the
// packed32q sink edge: dst[2r+rp][2c+cp] = phase[rp][cp][r][c])
void vf_interleave4_u32(const uint32_t* ee, const uint32_t* eo,
                        const uint32_t* oe, const uint32_t* oo, uint32_t* dst,
                        int64_t h2, int64_t w2) {
  for (int64_t r = 0; r < h2; ++r) {
    const uint32_t* pee = ee + r * w2;
    const uint32_t* peo = eo + r * w2;
    const uint32_t* poe = oe + r * w2;
    const uint32_t* poo = oo + r * w2;
    uint32_t* de = dst + (2 * r) * (2 * w2);
    uint32_t* do_ = dst + (2 * r + 1) * (2 * w2);
    for (int64_t c = 0; c < w2; ++c) {
      de[2 * c] = pee[c];
      de[2 * c + 1] = peo[c];
      do_[2 * c] = poe[c];
      do_[2 * c + 1] = poo[c];
    }
  }
}

// sixteen (h4, w4) u32 word planes (row-major grid phase order
// ph[4*qq + p]) -> (4*h4, 4*w4) u32 interleaved (the packed32g sink
// edge: dst[4r+qq][4c+p] = ph[4*qq+p][r][c])
void vf_interleave16_u32(const uint32_t* const* ph, uint32_t* dst,
                         int64_t h4, int64_t w4) {
  for (int64_t r = 0; r < h4; ++r) {
    for (int qq = 0; qq < 4; ++qq) {
      uint32_t* drow = dst + (4 * r + qq) * (4 * w4);
      const uint32_t* p0 = ph[4 * qq + 0] + r * w4;
      const uint32_t* p1 = ph[4 * qq + 1] + r * w4;
      const uint32_t* p2 = ph[4 * qq + 2] + r * w4;
      const uint32_t* p3 = ph[4 * qq + 3] + r * w4;
      for (int64_t c = 0; c < w4; ++c) {
        drow[4 * c] = p0[c];
        drow[4 * c + 1] = p1[c];
        drow[4 * c + 2] = p2[c];
        drow[4 * c + 3] = p3[c];
      }
    }
  }
}

// g*g (hg, wg) u32 word planes (row-major grid phase order
// ph[g*qq + p]) -> (g*hg, g*wg) u32 interleaved (the packed32g8 sink
// edge at g=8: dst[g*r+qq][g*c+p] = ph[g*qq+p][r][c])
void vf_interleave_grid_u32(const uint32_t* const* ph, uint32_t* dst,
                            int64_t hg, int64_t wg, int g) {
  for (int64_t r = 0; r < hg; ++r) {
    for (int qq = 0; qq < g; ++qq) {
      uint32_t* drow = dst + (g * r + qq) * (g * wg);
      for (int p = 0; p < g; ++p) {
        const uint32_t* src = ph[g * qq + p] + r * wg;
        uint32_t* d = drow + p;
        for (int64_t c = 0; c < wg; ++c) d[g * c] = src[c];
      }
    }
  }
}

// two flat u32 word streams -> pairwise interleave (the packed420g8
// half-word column interleave: dst[2i] = a[i], dst[2i+1] = b[i])
void vf_interleave2_u32(const uint32_t* a, const uint32_t* b, uint32_t* dst,
                        int64_t n) {
  for (int64_t i = 0; i < n; ++i) {
    dst[2 * i] = a[i];
    dst[2 * i + 1] = b[i];
  }
}

// (u32, u16) word-pair streams -> a 6-byte-period byte stream (the
// packed420g6 row re-join: dst[6i..6i+3] = a[i] bytes, dst[6i+4..5] =
// b[i] bytes — output cols 6c+{0..3} come four-per-u32, 6c+{4,5}
// two-per-u16)
void vf_interleave_6byte(const uint32_t* a, const uint16_t* b, uint8_t* dst,
                         int64_t n) {
  for (int64_t i = 0; i < n; ++i) {
    std::memcpy(dst + 6 * i, a + i, 4);
    std::memcpy(dst + 6 * i + 4, b + i, 2);
  }
}

// packed 4:2:2 [q0 q1 q2 q3] x (h * w/2) -> y (h, w), u, v (h, w/2)
// order: positions of (u, y0, v, y1) within the quad; UYVY = (0, 1, 2, 3),
// YUY2 = (1, 0, 3, 2)
void vf_unpack_422(const uint8_t* src, uint8_t* y, uint8_t* u, uint8_t* v,
                   int64_t h, int64_t w, int u_pos, int y0_pos, int v_pos,
                   int y1_pos) {
  const int64_t cw = w / 2;
  for (int64_t r = 0; r < h; ++r) {
    const uint8_t* row = src + r * cw * 4;
    uint8_t* yr = y + r * w;
    uint8_t* ur = u + r * cw;
    uint8_t* vr = v + r * cw;
    for (int64_t m = 0; m < cw; ++m) {
      const uint8_t* q = row + m * 4;
      ur[m] = q[u_pos];
      vr[m] = q[v_pos];
      yr[2 * m] = q[y0_pos];
      yr[2 * m + 1] = q[y1_pos];
    }
  }
}

void vf_pack_422(const uint8_t* y, const uint8_t* u, const uint8_t* v,
                 uint8_t* dst, int64_t h, int64_t w, int u_pos, int y0_pos,
                 int v_pos, int y1_pos) {
  const int64_t cw = w / 2;
  for (int64_t r = 0; r < h; ++r) {
    uint8_t* row = dst + r * cw * 4;
    const uint8_t* yr = y + r * w;
    const uint8_t* ur = u + r * cw;
    const uint8_t* vr = v + r * cw;
    for (int64_t m = 0; m < cw; ++m) {
      uint8_t* q = row + m * 4;
      q[u_pos] = ur[m];
      q[v_pos] = vr[m];
      q[y0_pos] = yr[2 * m];
      q[y1_pos] = yr[2 * m + 1];
    }
  }
}

// PNG row unfiltering (filters 0-4), RFC 2083.  raw: (h, 1+stride) rows with
// leading filter byte; out: (h, stride).  bpp = bytes per pixel.
static inline uint8_t paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = p > a ? p - a : a - p;
  int pb = p > b ? p - b : b - p;
  int pc = p > c ? p - c : c - p;
  if (pa <= pb && pa <= pc) return (uint8_t)a;
  if (pb <= pc) return (uint8_t)b;
  return (uint8_t)c;
}

int vf_png_unfilter(const uint8_t* raw, uint8_t* out, int64_t h,
                    int64_t stride, int bpp) {
  for (int64_t yrow = 0; yrow < h; ++yrow) {
    const uint8_t* line = raw + yrow * (stride + 1);
    const uint8_t ft = line[0];
    const uint8_t* srcrow = line + 1;
    uint8_t* dst = out + yrow * stride;
    const uint8_t* up = yrow ? out + (yrow - 1) * stride : nullptr;
    switch (ft) {
      case 0:
        memcpy(dst, srcrow, (size_t)stride);
        break;
      case 1:
        for (int64_t x = 0; x < stride; ++x)
          dst[x] = (uint8_t)(srcrow[x] + (x >= bpp ? dst[x - bpp] : 0));
        break;
      case 2:
        if (up)
          for (int64_t x = 0; x < stride; ++x)
            dst[x] = (uint8_t)(srcrow[x] + up[x]);
        else
          memcpy(dst, srcrow, (size_t)stride);
        break;
      case 3:
        for (int64_t x = 0; x < stride; ++x) {
          int left = x >= bpp ? dst[x - bpp] : 0;
          int above = up ? up[x] : 0;
          dst[x] = (uint8_t)(srcrow[x] + ((left + above) >> 1));
        }
        break;
      case 4:
        for (int64_t x = 0; x < stride; ++x) {
          int left = x >= bpp ? dst[x - bpp] : 0;
          int above = up ? up[x] : 0;
          int ul = (up && x >= bpp) ? up[x - bpp] : 0;
          dst[x] = (uint8_t)(srcrow[x] + paeth(left, above, ul));
        }
        break;
      default:
        return (int)ft;  // invalid filter type
    }
  }
  return 0;
}

}  // extern "C"
