"""Space-to-depth fused frontend: conv1 + ReLU + maxpool3 as one matmul.

Why: the prod model's first layer (conv3x3, 3->48 channels,
frameID/net.py:91-103) is the single most expensive stage but maps
terribly onto the 128x128 MXU — contraction depth 27 (21% of the systolic
depth) and 48 output lanes (37.5%), ~8% utilization.

The trick: the following ``MaxPool2d(3)`` (net.py:99) partitions conv
outputs into 3x3 cells, and one pool cell's 9 conv outputs depend on a
5x5(x3) input patch.  Gathering those patches (stride-3 space-to-depth
with a 1-pixel halo) turns layer 1 into a single dense matmul

    [B * H/3 * W/3, 75] @ [75, 432]

whose operand shapes use the MXU ~6x better; the 2.8x extra FLOPs (the
expanded weight matrix is block-Toeplitz with structural zeros) are far
cheaper than the utilization loss.  ReLU + the max over each cell's 9
sub-positions + BN follow on the [.., 9, 48] view.

Numerics: identical contraction terms in a different association order —
bitwise-exact against the reference path is NOT guaranteed (float
reassociation).

**Status: measured and rejected.**  On the real v5e the stride-3 patch
gathers (25 strided slices + a 75-channel concat) cost ~27x more than the
MXU-utilization win (2.5k fps vs 66k fps for the standard conv at
bf16_full) — XLA's native conv lowering already handles the small-channel
frontend better than this manual space-to-depth.  Kept as a documented
negative result with parity tests; not wired into the model
(models/assembly.py note, docs/PERFORMANCE.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from cut_detection_tpu.ops.nn import batch_norm_infer


def expanded_kernel(kernel: np.ndarray | jax.Array) -> jax.Array:
    """[3,3,Cin,Cout] conv kernel -> [25*Cin, 9*Cout] block-Toeplitz matrix.

    Row index: (iy*5 + ix)*Cin + c over the 5x5 patch; column index:
    (py*3 + px)*Cout + o over the pool cell's 9 conv sub-positions.
    Sub-position (py, px) reads patch pixels (py+dy, px+dx), dy,dx in 0..2.
    """
    k = jnp.asarray(kernel)
    cin, cout = k.shape[2], k.shape[3]
    w = jnp.zeros((5 * 5 * cin, 9 * cout), k.dtype)
    for py in range(3):
        for px in range(3):
            col = (py * 3 + px) * cout
            for dy in range(3):
                for dx in range(3):
                    row = ((py + dy) * 5 + (px + dx)) * cin
                    w = w.at[row:row + cin, col:col + cout].set(
                        k[dy, dx, :, :])
    return w


@functools.lru_cache(maxsize=None)
def _patch_slices(h: int, w: int) -> tuple[int, int]:
    """(pooled_h, pooled_w) for floor-mode pool of stride 3."""
    return h // 3, w // 3


def conv1_maxpool_fused(x, kernel, bias, bn_mean, bn_var, bn_gamma, bn_beta,
                        *, compute_dtype="bfloat16"):
    """Fused layer 1: x [B,H,W,Cin] -> [B,H//3,W//3,Cout].

    Equivalent to conv3x3(same,zero-pad) -> ReLU -> maxpool3(floor) -> BN
    (frameID/net.py:33-40 order) up to float reassociation.
    """
    b, h, w, cin = x.shape
    cout = kernel.shape[3]
    hp, wp = _patch_slices(h, w)
    dt = jnp.bfloat16 if compute_dtype is not None else jnp.float32

    # Zero padding = conv's 'same' border behavior.
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # 25 strided slices -> [B, hp, wp, 25*Cin] patches.
    slices = []
    for u in range(5):
        for v in range(5):
            slices.append(jax.lax.slice(
                xp,
                (0, u, v, 0),
                (b, u + 3 * (hp - 1) + 1, v + 3 * (wp - 1) + 1, cin),
                (1, 3, 3, 1),
            ))
    patches = jnp.concatenate(slices, axis=-1).astype(dt)

    wmat = expanded_kernel(kernel).astype(dt)
    out = jnp.einsum("bhwk,kn->bhwn", patches, wmat,
                     preferred_element_type=jnp.float32)
    out = out + jnp.tile(bias, 9)
    out = jax.nn.relu(out)
    out = jnp.max(out.reshape(b, hp, wp, 9, cout), axis=3)
    if str(compute_dtype) == "bfloat16_full":
        out = out.astype(jnp.bfloat16)
    return batch_norm_infer(out, bn_mean, bn_var, bn_gamma, bn_beta)
