"""Frame — a pytree of HBM-resident uint8 planes plus a static FrameSpec.

The device-side analog of a mapped GstVideoFrame.  Host byte layouts
(interleaved BGRA, NV12's interleaved UV, UYVY/YUY2 macro-pixels) are
converted to/from canonical planes at the host<->device boundary only;
inside a pipeline frames stay planar uint8 in HBM.

uint8 (not float) is the inter-element dtype on purpose: the reference's
render targets are RGBA8Unorm textures, so every element boundary quantizes
to 8 bits (metalconvertscalerenderer.m:263-289).  Reproducing that gives both
per-pixel parity and 4x less HBM traffic than float32 chains.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

import jax
import numpy as np

from tpuvf.core.formats import (
    PACKED_YUV_FORMATS,
    PLANAR_YUV_FORMATS,
    RGB_FORMATS,
    VideoFormat,
    chroma_dims_420,
    chroma_dims_422,
)
from tpuvf.core.spec import FrameSpec


@jax.tree_util.register_pytree_node_class
@dataclass
class Frame:
    """planes: canonical plane dict (see formats.canonical_planes).

    Arrays may be jax or numpy; dtype uint8.  An optional leading batch axis
    is allowed on every plane simultaneously.
    """

    planes: Dict[str, jax.Array]
    spec: FrameSpec

    def tree_flatten(self):
        keys = tuple(sorted(self.planes))
        return tuple(self.planes[k] for k in keys), (keys, self.spec)

    @classmethod
    def tree_unflatten(cls, aux, children):
        keys, spec = aux
        return cls(dict(zip(keys, children)), spec)

    @property
    def batched(self) -> bool:
        first = next(iter(self.planes.values()))
        base = 3 if "rgba" in self.planes else 2
        return first.ndim == base + 1

    def validate(self) -> None:
        expect = {p.name: p for p in self.spec.planes}
        if set(self.planes) != set(expect):
            raise ValueError(
                f"plane set {sorted(self.planes)} != expected {sorted(expect)}"
            )
        for name, arr in self.planes.items():
            p = expect[name]
            shape = (p.channels, p.height, p.width) if p.channels > 1 else (p.height, p.width)
            if tuple(arr.shape[-len(shape):]) != shape:
                raise ValueError(f"plane {name}: shape {arr.shape} != {shape}")
            if arr.dtype != np.uint8:
                raise ValueError(f"plane {name}: dtype {arr.dtype} != uint8")


# ---------------------------------------------------------------------------
# Host byte-layout <-> canonical planes
# ---------------------------------------------------------------------------
#
# Host frames are numpy arrays in the native memory layout of each format
# (what a mapped GstVideoFrame would contain):
#   BGRA / RGBA : (H, W, 4) uint8 in memory byte order
#   NV12        : dict {"y": (H, W), "uv": (ch, 2*cw)}      (UV interleaved)
#   I420        : dict {"y": (H, W), "u": (ch, cw), "v": (ch, cw)}
#   UYVY        : (H, 2*W) uint8 bytes  [U0 Y0 V0 Y1] per macro-pixel
#   YUY2        : (H, 2*W) uint8 bytes  [Y0 U0 Y1 V0]

_native = None
_native_checked = False


def _get_native():
    """Lazily load the optional C++ repacking extension (tpuvf.native)."""
    global _native, _native_checked
    if not _native_checked:
        _native_checked = True
        try:
            from tpuvf.native import lib as native_lib  # noqa: PLC0415

            native_lib._load()  # compile/load now; fall back on any failure
            _native = native_lib
        except Exception:
            _native = None
    return _native


# channel permutation mapping host byte order -> canonical R,G,B,A
_RGB_PERMS = {VideoFormat.RGBA: (0, 1, 2, 3), VideoFormat.BGRA: (2, 1, 0, 3)}


def host_to_planes(data, spec: FrameSpec) -> Dict[str, np.ndarray]:
    """Convert a host-layout frame to canonical planes (numpy)."""
    fmt, w, h = spec.format, spec.width, spec.height
    nat = _get_native()
    if fmt in RGB_FORMATS:
        arr = np.ascontiguousarray(data, dtype=np.uint8)
        if arr.shape != (h, w, 4):
            raise ValueError(f"{fmt} host frame must be (H, W, 4), got {arr.shape}")
        perm = _RGB_PERMS[fmt]
        if nat is not None:
            return {"rgba": nat.interleaved_to_planar(arr, perm)}
        return {"rgba": np.ascontiguousarray(arr[..., list(perm)].transpose(2, 0, 1))}
    if fmt == VideoFormat.NV12:
        cw, ch = chroma_dims_420(w, h)
        y = np.ascontiguousarray(data["y"], dtype=np.uint8)
        uv = np.ascontiguousarray(data["uv"], dtype=np.uint8)
        if nat is not None:
            u, v = nat.deinterleave2(uv)
        else:
            uvr = uv.reshape(ch, cw, 2)
            u = np.ascontiguousarray(uvr[..., 0])
            v = np.ascontiguousarray(uvr[..., 1])
        return {"y": y, "u": u, "v": v}
    if fmt == VideoFormat.I420:
        return {
            "y": np.ascontiguousarray(data["y"], dtype=np.uint8),
            "u": np.ascontiguousarray(data["u"], dtype=np.uint8),
            "v": np.ascontiguousarray(data["v"], dtype=np.uint8),
        }
    if fmt in PACKED_YUV_FORMATS:
        raw = np.ascontiguousarray(data, dtype=np.uint8)
        if raw.shape != (h, 2 * w):
            raise ValueError(f"{fmt} host frame must be (H, 2W) bytes, got {raw.shape}")
        if nat is not None:
            y, u, v = nat.unpack_422(raw, fmt.value)
            return {"y": y, "u": u, "v": v}
        cw, _ = chroma_dims_422(w, h)
        quads = raw.reshape(h, cw, 4)
        if fmt == VideoFormat.UYVY:  # U Y0 V Y1
            u, y0, v, y1 = quads[..., 0], quads[..., 1], quads[..., 2], quads[..., 3]
        else:  # YUY2: Y0 U Y1 V
            y0, u, y1, v = quads[..., 0], quads[..., 1], quads[..., 2], quads[..., 3]
        y = np.empty((h, w), np.uint8)
        y[:, 0::2] = y0
        y[:, 1::2] = y1
        return {"y": y, "u": np.ascontiguousarray(u), "v": np.ascontiguousarray(v)}
    raise ValueError(f"unknown format {fmt}")


def planes_to_host(planes: Dict[str, np.ndarray], spec: FrameSpec):
    """Convert canonical planes (numpy) back to the host byte layout.

    Accepts pipeline-edge "packed16" planes: a uint16 plane holds two
    horizontally adjacent u8 samples per word (even | odd << 8), whose
    little-endian bytes are identical to the interleaved u8 plane — the view
    below is free (kernels.convert.pack_words_u16)."""
    fmt, w, h = spec.format, spec.width, spec.height
    planes = {k: np.asarray(v) for k, v in planes.items()}
    for k, v in list(planes.items()):
        if v.dtype == np.uint16 and k != "b_g6":  # b_g6: 6-byte re-join below
            v = np.ascontiguousarray(v)
            planes[k] = v.view(np.uint8).reshape(v.shape[:-1] + (2 * v.shape[-1],))
    nat = _get_native()
    if fmt in RGB_FORMATS:
        for key, g in (("w_g8", 8), ("w_g6", 6), ("w_g3", 3)):
            # pipeline-edge "packed32g{8,6,3}" plane: (g*g, H/g, W/g)
            # u32 PIXEL words, (row mod g x col mod g) phases stacked
            # row-major (kernels.convert.pack_rgba_grid{64,36,9},
            # round 5) — the g x g rows+columns interleave in one
            # repack pass
            if key not in planes:
                continue
            wg = np.ascontiguousarray(planes[key])
            hg, wgw = wg.shape[-2:]
            grid = [wg[i] for i in range(g * g)]
            if nat is not None:
                out = nat.interleave_grid_u32(grid, g)
            else:
                out = np.empty((g * hg, g * wgw), np.uint32)
                for i, gp in enumerate(grid):
                    out[i // g::g, i % g::g] = gp
            return out.view(np.uint8).reshape(out.shape[0], out.shape[1], 4)
        if "w_g" in planes:
            # pipeline-edge "packed32g" plane: (16, H/4, W/4) u32 PIXEL
            # words, GRID16 (row mod 4 x col mod 4) phases stacked
            # row-major (kernels.convert.pack_rgba_grid16) — the 4x4
            # rows+columns interleave in one repack pass
            wg = np.ascontiguousarray(planes["w_g"])
            grid = [wg[i] for i in range(16)]
            if nat is not None:
                out = nat.interleave16_u32(grid)
            else:
                h4, w4 = grid[0].shape
                out = np.empty((4 * h4, 4 * w4), np.uint32)
                for i, g in enumerate(grid):
                    out[i // 4::4, i % 4::4] = g
            return out.view(np.uint8).reshape(out.shape[0], out.shape[1], 4)
        if "w_q" in planes:
            # pipeline-edge "packed32q" plane: (4, H/2, W/2) u32 PIXEL
            # words, QUAD (row x col) phases stacked (kernels.convert.
            # pack_rgba_quad) — the rows+columns interleave in one
            # repack pass
            wq = np.ascontiguousarray(planes["w_q"])
            quads = [wq[i] for i in range(4)]
            if nat is not None:
                out = nat.interleave4_u32(*quads)
            else:
                h2, w2 = quads[0].shape
                out = np.empty((2 * h2, 2 * w2), np.uint32)
                out[0::2, 0::2], out[0::2, 1::2] = quads[0], quads[1]
                out[1::2, 0::2], out[1::2, 1::2] = quads[2], quads[3]
            return out.view(np.uint8).reshape(out.shape[0], out.shape[1], 4)
        if "w_c" in planes:
            # pipeline-edge "packed32" plane: (2, H, W/2) u32 PIXEL words,
            # column phases stacked, bytes already in the host format's
            # order (kernels.convert.pack_words_u32) — interleave the two
            # phase word streams and view as bytes
            wc = np.ascontiguousarray(planes["w_c"])
            we, wo = wc[0], wc[1]
            out = np.empty((we.shape[0], 2 * we.shape[1]), np.uint32)
            out[:, 0::2] = we
            out[:, 1::2] = wo
            return out.view(np.uint8).reshape(we.shape[0], 2 * we.shape[1], 4)
        if nat is not None:
            return nat.planar_to_interleaved(planes["rgba"], _RGB_PERMS[fmt])
        rgba = planes["rgba"].transpose(1, 2, 0)
        if fmt == VideoFormat.BGRA:
            rgba = rgba[..., [2, 1, 0, 3]]
        return np.ascontiguousarray(rgba)
    if "uv_s" in planes:
        # pipeline-edge stacked chroma (packed16 sink form): (2, ch, cw)
        # u8, u on slab 0 and v on slab 1 (kernels.convert.pack_rgba_split)
        uvs = np.ascontiguousarray(planes["uv_s"])
        planes = dict(planes, u=uvs[0], v=uvs[1])
        del planes["uv_s"]
    if "a_g6" in planes and fmt in (VideoFormat.NV12, VideoFormat.I420):
        # pipeline-edge "packed420g6" planes (kernels.convert.
        # pack_420_grid36): a_g6 (9, H/6, W/6) u32 + b_g6 (9, H/6, W/6)
        # u16 — entries 0-5 luma row phases (col phases 0-3 / 4-5 one
        # byte each), entries 6-8 chroma row phases (NV12-ordered uv
        # bytes for chroma cols 3c+{0,1} / {2}).  One 6-byte-period
        # (u32, u16) interleave per phase, then rows mod 6 / mod 3.
        ag = np.ascontiguousarray(planes["a_g6"])
        bg = np.ascontiguousarray(planes["b_g6"])
        h6, w6 = ag.shape[-2:]

        def six(a, b):
            if nat is not None:
                return nat.interleave_6byte(a, b)
            out = np.empty((h6, w6, 6), np.uint8)
            out[..., :4] = a.view(np.uint8).reshape(h6, w6, 4)
            out[..., 4:] = b.view(np.uint8).reshape(h6, w6, 2)
            return out.reshape(h6, 6 * w6)

        y = np.empty((h, w), np.uint8)
        for qr in range(6):
            y[qr::6] = six(ag[qr], bg[qr])
        cw, ch = chroma_dims_420(w, h)
        uv = np.empty((ch, 2 * cw), np.uint8)
        for ca in range(3):
            uv[ca::3] = six(ag[6 + ca], bg[6 + ca])
        if fmt == VideoFormat.NV12:
            return {"y": y, "uv": uv}
        if nat is not None:
            u, v = nat.deinterleave2(uv)
        else:
            u = np.ascontiguousarray(uv[:, 0::2])
            v = np.ascontiguousarray(uv[:, 1::2])
        return {"y": y, "u": u, "v": v}
    if "y_g8" in planes and fmt in (VideoFormat.NV12, VideoFormat.I420):
        # pipeline-edge "packed420g8" planes (kernels.convert.
        # pack_420_grid64): y_g8 (16, H/8, W/8) u32 — entry 2*qr+h is row
        # phase qr's col phases 4h..4h+3; uv_g8 (8, H/8, W/8) u32 —
        # entry 2*ca+h's bytes are NV12's interleaved uv bytes for
        # chroma cols 4c+2h, 4c+2h+1.  Interleave the two half-word
        # streams per block column (u32 ops), then rows mod 8 / mod 4.
        yg = np.ascontiguousarray(planes["y_g8"])
        h8, w8 = yg.shape[-2:]

        def pair(a, b):
            if nat is not None:
                return nat.interleave2_u32(a, b)
            out = np.empty((h8, 2 * w8), np.uint32)
            out[:, 0::2] = a
            out[:, 1::2] = b
            return out

        y = np.empty((h, w), np.uint8)
        for qr in range(8):
            y[qr::8] = pair(yg[2 * qr],
                            yg[2 * qr + 1]).view(np.uint8).reshape(h8, w)
        uvg = np.ascontiguousarray(planes["uv_g8"])
        cw, ch = chroma_dims_420(w, h)
        uv = np.empty((ch, 2 * cw), np.uint8)
        for ca in range(4):
            uv[ca::4] = pair(uvg[2 * ca],
                             uvg[2 * ca + 1]).view(np.uint8).reshape(
                                 h8, 2 * cw)
        if fmt == VideoFormat.NV12:
            return {"y": y, "uv": uv}
        if nat is not None:
            u, v = nat.deinterleave2(uv)
        else:
            u = np.ascontiguousarray(uv[:, 0::2])
            v = np.ascontiguousarray(uv[:, 1::2])
        return {"y": y, "u": u, "v": v}
    if "y_g" in planes and fmt in (VideoFormat.NV12, VideoFormat.I420):
        # pipeline-edge "packed420g" planes (kernels.convert.pack_420_grid16):
        # y_g (4, H/4, W/4) u32 — bytes are row phase qq's full-width luma
        # rows; uv_g (2, H/4, W/4) u32 — bytes are NV12's interleaved uv
        # rows per chroma row phase.  Row interleaves are contiguous
        # row copies.
        yg = np.ascontiguousarray(planes["y_g"]).view(np.uint8)
        yg = yg.reshape(4, h // 4, w)
        y = np.empty((h, w), np.uint8)
        for qq in range(4):
            y[qq::4] = yg[qq]
        uvg = np.ascontiguousarray(planes["uv_g"]).view(np.uint8)
        cw, ch = chroma_dims_420(w, h)
        uvg = uvg.reshape(2, ch // 2, 2 * cw)
        uv = np.empty((ch, 2 * cw), np.uint8)
        uv[0::2] = uvg[0]
        uv[1::2] = uvg[1]
        if fmt == VideoFormat.NV12:
            return {"y": y, "uv": uv}
        nat2 = nat
        if nat2 is not None:
            u, v = nat2.deinterleave2(uv)
        else:
            u = np.ascontiguousarray(uv[:, 0::2])
            v = np.ascontiguousarray(uv[:, 1::2])
        return {"y": y, "u": u, "v": v}
    if "y_q" in planes and fmt in (VideoFormat.NV12, VideoFormat.I420):
        # pipeline-edge "packed16q" y: the u16 prepass above already turned
        # the stacked (2, H/2, W/2) word plane into full-width u8 rows per
        # row phase — the row interleave is contiguous row copies
        yq = planes["y_q"]
        y = np.empty((h, w), np.uint8)
        y[0::2] = yq[0]
        y[1::2] = yq[1]
        planes = dict(planes, y=y)
        uvq = planes["uv_q"]
        planes = dict(planes, u=uvq[0], v=uvq[1])
    if fmt == VideoFormat.NV12:
        if nat is not None:
            uv = nat.interleave2(planes["u"], planes["v"])
        else:
            cw, ch = chroma_dims_420(w, h)
            uv = np.empty((ch, 2 * cw), np.uint8)
            uv[:, 0::2] = planes["u"]
            uv[:, 1::2] = planes["v"]
        return {"y": planes["y"], "uv": uv}
    if fmt == VideoFormat.I420:
        return {"y": planes["y"], "u": planes["u"], "v": planes["v"]}
    if fmt in PACKED_YUV_FORMATS:
        if nat is not None:
            return nat.pack_422(planes["y"], planes["u"], planes["v"], fmt.value)
        cw, _ = chroma_dims_422(w, h)
        raw = np.empty((h, cw, 4), np.uint8)
        y0 = planes["y"][:, 0::2]
        y1 = planes["y"][:, 1::2]
        if fmt == VideoFormat.UYVY:
            raw[..., 0], raw[..., 1], raw[..., 2], raw[..., 3] = (
                planes["u"], y0, planes["v"], y1,
            )
        else:
            raw[..., 0], raw[..., 1], raw[..., 2], raw[..., 3] = (
                y0, planes["u"], y1, planes["v"],
            )
        return raw.reshape(h, 4 * cw)
    raise ValueError(f"unknown format {fmt}")


def quad_planes_host(planes: Dict[str, np.ndarray], spec: FrameSpec):
    """Canonical planes -> QUAD (row x column phase) planes, on the host.

    The quad-link source provisioning (the row-phase analog of
    split_planes_host): 4:2:0 luma splits into four (H/2, W/2) phase
    planes in one native pass (vf_split_quad); chroma stays whole — every
    quad phase reads it through the 2-tap row/column stencils
    (kernels.convert.plan_rgba_sampler_quad).  RGB frames split every
    channel.  Layout matches the "quad" link convention."""
    nat = _get_native()

    def quad(plane):
        if nat is not None:
            return nat.split_quad(plane)
        return tuple(np.ascontiguousarray(plane[rp::2, cp::2])
                     for rp in (0, 1) for cp in (0, 1))

    names = ("ee", "eo", "oe", "oo")
    if spec.format in RGB_FORMATS:
        rgba = planes["rgba"]
        out = {}
        for c, n in enumerate(("r", "g", "b", "a")):
            for ph, q in zip(names, quad(rgba[c])):
                out[f"{n}_{ph}"] = q
        return out
    out = {f"y_{ph}": q for ph, q in zip(names, quad(planes["y"]))}
    out["u"] = planes["u"]
    out["v"] = planes["v"]
    return out


def chroma_pair_rows(c: np.ndarray):
    """(..., ch, cw) chroma plane -> full-height (..., 2*ch, cw) PAIR
    planes (main, adj): row 2k reads c[k] / c[max(k-1,0)], row 2k+1 reads
    c[k] / c[min(k+1,ch-1)].  The device-side LINEAR chroma row
    2x-upsample (taps 0.25/0.75, edge-clamped — the texture sampler's
    bilinear rows, metalconvertscale_shaders.h:71-148) then becomes the
    pure elementwise expression ``0.25*adj + 0.75*main``: bitwise equal
    to the stencil forms (IEEE addition commutes), but with NO device
    relayout/interleave to pin — it fuses into every consumer, so
    sibling compositor cell folds stop re-reading a materialized
    full-height f32 chroma plane (round-4's characterized config-5
    residual: 17.6 MB/op x 8 fusions)."""
    ch = c.shape[-2]
    m = np.repeat(c, 2, axis=-2)
    a = np.empty_like(m)
    idx_prev = np.maximum(np.arange(ch) - 1, 0)
    idx_next = np.minimum(np.arange(ch) + 1, ch - 1)
    a[..., 0::2, :] = c[..., idx_prev, :]
    a[..., 1::2, :] = c[..., idx_next, :]
    return np.ascontiguousarray(m), np.ascontiguousarray(a)


def split_planes_host(planes: Dict[str, np.ndarray], spec: FrameSpec,
                      chroma_pair: bool = False):
    """Canonical planes -> column-phase SPLIT planes, on the host.

    Device-side u8 deinterleaves cost full-plane relayout copies (~150 us
    per 33 MB at 4K in the device trace); the host repack — the analog of
    the reference's texture-cache upload (vfmetaltextureutil.m:108-111) —
    does the same strided copy at memcpy speed during the transfer that
    happens anyway.  Layouts match the "split" link convention
    (core/element.py): RGB -> {"r_e","g_e","b_e","a_e","r_o",...} u8;
    4:2:0 -> {"y_e","y_o","u","v"} u8."""
    nat = _get_native()

    def deint(plane):
        if nat is not None:
            return nat.deinterleave2(plane)
        return (np.ascontiguousarray(plane[:, 0::2]),
                np.ascontiguousarray(plane[:, 1::2]))

    if spec.format in RGB_FORMATS:
        rgba = planes["rgba"]
        out = {}
        for c, n in enumerate(("r", "g", "b", "a")):
            out[f"{n}_e"], out[f"{n}_o"] = deint(rgba[c])
        return out
    y_e, y_o = deint(planes["y"])
    out = {"y_e": y_e, "y_o": y_o, "u": planes["u"], "v": planes["v"]}
    if (chroma_pair and spec.format in PLANAR_YUV_FORMATS
            and spec.height % 2 == 0):
        # compositor-pad provisioning (round 5): full-height PAIR chroma
        # alongside the canonical half-height planes (the general/
        # animated variant still reads "u"/"v")
        for n in ("u", "v"):
            out[f"{n}_m"], out[f"{n}_a"] = chroma_pair_rows(planes[n])
    return out


def frame_from_host(data, spec: FrameSpec, device=None) -> Frame:
    planes = host_to_planes(data, spec)
    put = (lambda a: jax.device_put(a, device)) if device else jax.device_put
    return Frame({k: put(v) for k, v in planes.items()}, spec)


def frame_to_host(frame: Frame):
    return planes_to_host({k: np.asarray(v) for k, v in frame.planes.items()}, frame.spec)
