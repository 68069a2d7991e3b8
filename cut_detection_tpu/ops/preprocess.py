"""Device-side frame preprocessing.

The reference converts each decoded frame on the *host*:
BGR uint8 HWC -> float32 CHW -> channel flip (BGR->RGB) -> /255
(frameID/data.py:224-228), and uploads float32 to the device.

TPU-first redesign: frames cross host->HBM as **uint8** (4x less PCIe
traffic than float32) and the flip/scale — and optionally the resize —
happen on device where they fuse into the first convolution.  Layout stays
NHWC end to end (the model is NHWC; see cut_detection_tpu/ops/nn.py).
"""

from __future__ import annotations

import jax.numpy as jnp

from cut_detection_tpu.ops.resize import resize_bilinear


def normalize_frames(frames_u8_bgr):
    """uint8 BGR NHWC -> float32 RGB NHWC in [0, 1].

    Equivalent to the reference's ``torch.flip(t.permute(2,0,1), (0,)) / 255``
    (frameID/data.py:224-228) modulo layout: the flip reverses the channel
    axis (BGR->RGB) and the divide maps to [0, 1].  ``uint8 -> float32`` is
    exact, and ``x / 255`` matches torch's elementwise float division.
    """
    rgb = frames_u8_bgr[..., ::-1]
    return rgb.astype(jnp.float32) / 255.0


def preprocess_u8_batch(frames_u8_bgr, out_h: int | None = None,
                        out_w: int | None = None, *, exact: bool = True):
    """Full device-side preprocess: [resize ->] BGR flip -> float /255.

    If ``out_h``/``out_w`` are given, frames are resized on device first
    (``exact=True`` reproduces cv2's uint8 fixed-point INTER_LINEAR, so the
    result is bit-identical to the reference's host resize).  If omitted,
    frames are assumed to be pre-resized on the host (the default production
    path — a width-256 uint8 frame is ~110 KB, cheaper to ship than raw).
    """
    if (out_h is None) != (out_w is None):
        # Silently skipping the resize would surface much later as a
        # conv-stack shape mismatch, far from the actual mistake.
        raise ValueError(
            f"out_h and out_w must be given together, got "
            f"out_h={out_h}, out_w={out_w}")
    x = frames_u8_bgr
    if out_h is not None:
        x = resize_bilinear(x, out_h, out_w, exact=exact)
    return normalize_frames(x)
