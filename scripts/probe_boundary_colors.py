"""Search for near-decision-boundary block colors for the eval corpus.

The committed corpus clips (scripts/make_eval_corpus.py) use colors with
2.4-8.7 logit margins — good regression anchors, but quantization bugs in
the fast precision rungs can never trip a 0.99 frame-accuracy gate there
(VERDICT r2 weak #7).  This probe scans BGR space for colors whose
float32 prod-net margin (top1 - top2 logit) is SMALL at the corpus noise
level, so bfloat16/uint8 rounding visibly flips frames pre-smoothing.

For each candidate color: render corpus-style frames (constant base +
U(0,8) noise at 384x216, cv2-resized to 256x144), classify with the
float32 net, and report (margin mean/min, majority class, flip rate).
Candidates are mutations of the existing corpus colors plus random draws.

Usage: PYTHONPATH= python scripts/probe_boundary_colors.py  (CPU)
"""

from __future__ import annotations

import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import cv2
import jax.numpy as jnp

from cut_detection_tpu.models.assembly import load_default_net

H, W = 216, 384
RH, RW = 144, 256


def frames_for_color(color_bgr, n=12, seed=0):
    rng = np.random.default_rng(seed)
    base = np.full((H, W, 3), color_bgr, np.uint8)
    out = np.empty((n, RH, RW, 3), np.uint8)
    for i in range(n):
        f = cv2.add(base, rng.integers(0, 8, (H, W, 3), dtype=np.uint8))
        out[i] = cv2.resize(f, (RW, RH), interpolation=cv2.INTER_LINEAR)
    return out


def margins(net, frames_u8):
    # Pipeline-equivalent preprocess: BGR->RGB flip + /255.
    x = jnp.asarray(frames_u8[..., ::-1].astype(np.float32) / 255.0)
    logits = np.asarray(net(x))
    order = np.sort(logits, axis=1)
    margin = order[:, -1] - order[:, -2]
    pred = logits.argmax(1)
    return margin, pred


def main():
    net, _ = load_default_net(precision="float32")
    net_bf, _ = load_default_net(precision="bfloat16_full")
    rng = np.random.default_rng(42)

    candidates = []
    # Mutations of the existing corpus colors toward each other.
    anchors = [(60, 60, 140), (0, 60, 120), (80, 140, 200), (160, 160, 30),
               (10, 10, 10), (40, 120, 40)]
    for a in anchors:
        for b in anchors:
            if a == b:
                continue
            for t in np.linspace(0.2, 0.8, 13):
                c = tuple(int(round(a[i] * (1 - t) + b[i] * t))
                          for i in range(3))
                candidates.append(c)
    for _ in range(400):
        candidates.append(tuple(int(v) for v in rng.integers(0, 256, 3)))

    rows = []
    seen = set()
    for c in candidates:
        if c in seen:
            continue
        seen.add(c)
        fr = frames_for_color(c)
        m, p = margins(net, fr)
        if m.mean() < 0.6:
            mb, pb = margins(net_bf, fr)
            flips = int((p != pb).sum())
            maj = int(np.bincount(p, minlength=3).argmax())
            stable = float((p == maj).mean())
            rows.append((float(m.mean()), float(m.min()), c, maj, stable,
                         flips))
    rows.sort()
    print(f"stage 1: {len(rows)} raw-frame candidates with mean margin "
          "< 0.6 (margin_mean, margin_min, BGR, maj_class, "
          "f32_stability, bf16_flips/12):")
    for r in rows[:30]:
        print("  ", r)

    # Stage 2: the corpus clips are mp4s — the codec's YUV round trip +
    # quantization shifts flat colors by several units, which moves a
    # 0.02-margin color far off the boundary (measured: the stage-1
    # winner landed at margin 1.7 in-clip).  Re-probe the shortlist and
    # +-4 channel perturbations THROUGH the codec: one mp4, 12 frames
    # per candidate, same writer settings and noise as the corpus.
    import tempfile

    shortlist = []
    for _, _, c, *_ in rows[:25]:
        for d in [(0, 0, 0), (4, 0, 0), (-4, 0, 0), (0, 4, 0), (0, -4, 0),
                  (0, 0, 4), (0, 0, -4), (8, 0, 0), (0, 8, 0), (0, 0, 8)]:
            cc = tuple(int(np.clip(c[i] + d[i], 0, 255)) for i in range(3))
            if cc not in shortlist:
                shortlist.append(cc)

    path = tempfile.mktemp(suffix=".mp4")
    wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30, (W, H))
    enc_rng = np.random.default_rng(3)  # corpus_adv's seed
    nper = 12
    for c in shortlist:
        base = np.full((H, W, 3), c, np.uint8)
        for _ in range(nper):
            wr.write(cv2.add(base, enc_rng.integers(0, 8, (H, W, 3),
                                                    dtype=np.uint8)))
    wr.release()

    from cut_detection_tpu.data.video import VideoFrameSource

    src = VideoFrameSource(path, resize=256)
    frames = np.stack([f for f in src])
    best = []
    for i, c in enumerate(shortlist):
        fr = frames[i * nper:(i + 1) * nper]
        m, p = margins(net, fr)
        mb, pb = margins(net_bf, fr)
        flips = int((p != pb).sum())
        maj = int(np.bincount(p, minlength=3).argmax())
        stable = float((p == maj).mean())
        best.append((float(m.mean()), float(m.min()), c, maj, stable,
                     flips))
    best.sort()
    print("stage 2 (through the codec): "
          "(margin_mean, margin_min, BGR, maj, f32_stability, "
          "bf16_flips/12):")
    for r in best[:25]:
        print("  ", r)


if __name__ == "__main__":
    main()
