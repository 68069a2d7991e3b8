"""Derive/verify the ops/yuv.py fixed-point constants from live swscale.

Probes ``vd_yuv420_to_bgr24`` (native/libcutdet_decoder.so — the same
swscale build cv2 uses) to:

1. confirm nearest 2x2 chroma upsampling,
2. extract the additive integer tables ly/bu/gu/gv/rv per channel,
3. fit the (coef, round) >> 16 closed forms and print the feasible
   rounding bands,
4. EXHAUSTIVELY verify all 2^24 (Y,U,V) combinations against the
   closed forms shipped in ops/yuv.py (one 4096x4096 probe image).

Run on any host with the native decoder built:
  PYTHONPATH= python scripts/derive_yuv_constants.py
Exit 0 = the shipped constants reproduce this swscale exactly.
"""

from __future__ import annotations

import ctypes
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cut_detection_tpu.ops.yuv import _tables_np, yuv420_to_bgr_np  # noqa: E402

_LIB = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "native", "libcutdet_decoder.so")


def _conv_fn():
    lib = ctypes.CDLL(_LIB)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.vd_yuv420_to_bgr24.argtypes = [u8p, u8p, u8p, ctypes.c_int,
                                       ctypes.c_int, u8p]

    def conv(y, u, v):
        h, w = y.shape
        out = np.empty((h, w, 3), np.uint8)
        y, u, v = [np.ascontiguousarray(a) for a in (y, u, v)]
        assert lib.vd_yuv420_to_bgr24(
            y.ctypes.data_as(u8p), u.ctypes.data_as(u8p),
            v.ctypes.data_as(u8p), w, h, out.ctypes.data_as(u8p)) == 1
        return out

    return conv


def _extract_additive(M):
    """M[c, y] = clip8(ly[y] + cc[c]); recover the integer tables."""
    cc = np.full(256, 10**9, np.int64)
    ly = np.full(256, 10**9, np.int64)
    interior = (M > 0) & (M < 255)
    cc[128] = 0
    ly[interior[128]] = M[128][interior[128]]
    for _ in range(8):
        known = ly < 10**8
        for c in range(256):
            if cc[c] < 10**8:
                m2 = interior[c] & ~known
                ly[m2] = M[c][m2] - cc[c]
            else:
                m = interior[c] & known
                if m.any():
                    cc[c] = M[c][m][0] - ly[m][0]
        known = ly < 10**8
        if known.all() and (cc < 10**8).all():
            break
    assert (ly < 10**8).all() and (cc < 10**8).all()
    assert (np.clip(ly[None, :] + cc[:, None], 0, 255) == M).all()
    return ly, cc


def _fit_band(table, center_coef, base_idx):
    """All (coef, round) with (coef*(i-base)+r)>>16 == table, near center."""
    i = np.arange(256)
    fits = []
    for a in range(center_coef - 60, center_coef + 61):
        base = a * (i - base_idx)
        lo = ((table << 16) - base).max()
        hi = (((table + 1) << 16) - base - 1).min()
        if lo <= hi:
            fits.append((a, int(lo), int(hi)))
    return fits


def main() -> int:
    conv = _conv_fn()

    # 1. chroma upsampling: one chroma sample colors its 2x2 block.
    y = np.full((4, 4), 128, np.uint8)
    u = np.array([[0, 255], [255, 0]], np.uint8)
    v = np.full((2, 2), 128, np.uint8)
    blk = conv(y, u, v)[..., 0]
    assert (blk[:2, :2] == blk[0, 0]).all() and (blk[2:, 2:] == blk[2, 2]).all()
    print("chroma upsample: nearest 2x2 confirmed")

    # 2. per-channel table extraction from (Y x chroma) sweeps.
    Y = np.tile(np.arange(256, dtype=np.uint8), (512, 2))
    crm = np.arange(256, dtype=np.uint8)[:, None].repeat(256, 1)
    mid = np.full((256, 256), 128, np.uint8)
    oU = conv(Y, crm, mid)
    oV = conv(Y, mid, crm)
    ly_b, bu = _extract_additive(oU[::2, :256, 0].astype(np.int64))
    ly_g, gu = _extract_additive(oU[::2, :256, 1].astype(np.int64))
    ly_r, rv = _extract_additive(oV[::2, :256, 2].astype(np.int64))
    _, gv = _extract_additive(oV[::2, :256, 1].astype(np.int64))
    assert np.array_equal(ly_b, ly_g) and np.array_equal(ly_b, ly_r)
    print("shared luma table confirmed; additive structure exact")

    # 3. closed forms.
    for name, tab, center, base in (("ly", ly_b + 0, 76309, 16),
                                    ("bu", bu, 132201, 128),
                                    ("gu", gu, -25671, 128),
                                    ("gv", gv, -53279, 128),
                                    ("rv", rv, 104597, 128)):
        fits = _fit_band(tab, center, base)
        print(f"{name}: feasible (coef, r_lo, r_hi) bands: {fits[:3]}"
              f"{' ...' if len(fits) > 3 else ''}")
        assert fits, f"no affine form for {name} — swscale changed?"
    shipped = _tables_np()
    for name, tab in (("ly", ly_b), ("bu", bu), ("gu", gu), ("gv", gv),
                      ("rv", rv)):
        assert np.array_equal(shipped[name], tab), \
            f"shipped {name} table no longer matches live swscale"
    print("shipped closed forms match all extracted tables")

    # 4. exhaustive 2^24 verification against the shipped numpy twin.
    cu, cvv = np.meshgrid(np.arange(256, dtype=np.uint8),
                          np.arange(256, dtype=np.uint8), indexing="ij")
    U = np.tile(cu, (8, 8))
    V = np.tile(cvv, (8, 8))
    bi, bj = np.meshgrid(np.arange(2048), np.arange(2048), indexing="ij")
    ybase = ((bi // 256) * 8 + (bj // 256)) * 4
    Yimg = np.zeros((4096, 4096), np.uint8)
    Yimg[0::2, 0::2] = ybase
    Yimg[0::2, 1::2] = ybase + 1
    Yimg[1::2, 0::2] = ybase + 2
    Yimg[1::2, 1::2] = ybase + 3
    want = conv(Yimg, U, V)
    from cut_detection_tpu.ops.yuv import pack_yuv420

    got = yuv420_to_bgr_np(pack_yuv420(Yimg, U, V), 4096, 4096)
    bad = int((got != want).sum())
    print(f"exhaustive 2^24 check: {bad} mismatching bytes")
    return 0 if bad == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
