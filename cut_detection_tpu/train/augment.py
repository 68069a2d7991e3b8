"""On-device batched image augmentation (SimCLR pipeline).

The reference's contrastive pipeline applies torchvision transforms twice
per image inside host DataLoader workers (learn_contrasts.py:48-56,
frameID/data.py:86-93): RandomAffine(±15°, translate 0.2, scale 1-1.4)
→ ColorJitter(0.4, 0.4, 0.4) → RandomResizedCrop((144, 256), scale
(0.5, 1), ratio (1.77, 1.78)).

TPU-first redesign: augmentation is a jit-able, keyed, batched function
that runs on device — the host ships one uint8 batch and the two views are
generated on-chip (no 3-worker CPU augmentation bottleneck, no double PCIe
traffic).  Geometric transforms are expressed as per-image affine sampling
grids with static output shapes (a varying-size crop + resize becomes one
affine gather, XLA-friendly).

Semantics follow the torchvision ops the reference uses:

- affine: angle ~ U(-d, d), translation ~ U(-t, t) * size (per axis),
  scale ~ U(lo, hi), rotation about the image center, zero fill,
  nearest-neighbor sampling (torchvision's RandomAffine default).
- color jitter: factors ~ U(max(0, 1-v), 1+v) for brightness/contrast/
  saturation, applied in a random order per image (torchvision semantics;
  contrast/saturation blend against the grayscale mean / grayscale image).
- random resized crop: area fraction ~ U(s_lo, s_hi), aspect ratio
  log-uniform in (r_lo, r_hi), retry-until-fit approximated by clamping the
  box into bounds (the (1.77, 1.78) ratio band on 16:9 frames virtually
  always fits); bilinear resample of the box to the target size.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp


def _grayscale(x):
    """ITU-R 601 luma, matching torchvision rgb_to_grayscale weights."""
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    return 0.2989 * r + 0.587 * g + 0.114 * b


def _sample_affine_grid(h: int, w: int, angle, translate_xy, scale):
    """Source-coordinate grid for a rotation/scale/translation about center.

    Returns (ys, xs) of shape [h, w]: for each output pixel, the input
    coordinate to sample (inverse-mapped, like torchvision's affine).
    """
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy = jnp.arange(h, dtype=jnp.float32)[:, None] - cy
    xx = jnp.arange(w, dtype=jnp.float32)[None, :] - cx
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    # Inverse of rotate(angle) * scale: rotate(-angle) / scale.
    inv = 1.0 / scale
    tx, ty = translate_xy
    x_rel = xx - tx
    y_rel = yy - ty
    xs = (cos * x_rel + sin * y_rel) * inv + cx
    ys = (-sin * x_rel + cos * y_rel) * inv + cy
    return ys, xs


def _gather_nearest(img, ys, xs):
    """Nearest-neighbor sample with zero fill outside bounds."""
    h, w = img.shape[0], img.shape[1]
    yi = jnp.round(ys).astype(jnp.int32)
    xi = jnp.round(xs).astype(jnp.int32)
    valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
    yc = jnp.clip(yi, 0, h - 1)
    xc = jnp.clip(xi, 0, w - 1)
    out = img[yc, xc]
    return jnp.where(valid[..., None], out, 0.0)


def _gather_bilinear(img, ys, xs):
    """Bilinear sample with edge clamping."""
    h, w = img.shape[0], img.shape[1]
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    fy = jnp.clip(ys - y0.astype(jnp.float32), 0.0, 1.0)[..., None]
    fx = jnp.clip(xs - x0.astype(jnp.float32), 0.0, 1.0)[..., None]
    p00, p01 = img[y0, x0], img[y0, x1]
    p10, p11 = img[y1, x0], img[y1, x1]
    top = p00 * (1 - fx) + p01 * fx
    bot = p10 * (1 - fx) + p11 * fx
    return top * (1 - fy) + bot * fy


def affine_transform(img, angle_rad, translate_xy, scale,
                     *, interp: str = "nearest"):
    """Deterministic single-image affine (rotation about center, scale,
    translation; zero fill).  The sampling primitive under
    ``random_affine`` — exposed for direct geometric testing."""
    h, w = img.shape[0], img.shape[1]
    ys, xs = _sample_affine_grid(h, w, angle_rad, translate_xy, scale)
    if interp == "nearest":
        return _gather_nearest(img, ys, xs)
    return _gather_bilinear(img, ys, xs)


def random_affine(key, x, *, degrees: float = 15.0,
                  translate: tuple[float, float] = (0.2, 0.2),
                  scale: tuple[float, float] = (1.0, 1.4)):
    """Batched RandomAffine (learn_contrasts.py:50 parameters)."""
    b, h, w = x.shape[0], x.shape[1], x.shape[2]
    k1, k2, k3, k4 = jax.random.split(key, 4)
    angles = jax.random.uniform(k1, (b,), minval=-degrees, maxval=degrees)
    angles = angles * (math.pi / 180.0)
    tx = jax.random.uniform(k2, (b,), minval=-translate[0], maxval=translate[0]) * w
    ty = jax.random.uniform(k3, (b,), minval=-translate[1], maxval=translate[1]) * h
    scales = jax.random.uniform(k4, (b,), minval=scale[0], maxval=scale[1])

    def one(img, angle, txi, tyi, sc):
        return affine_transform(img, angle, (txi, tyi), sc)

    return jax.vmap(one)(x, angles, tx, ty, scales)


def color_jitter(key, x, *, brightness: float = 0.4, contrast: float = 0.4,
                 saturation: float = 0.4):
    """Batched ColorJitter (learn_contrasts.py:51 parameters).

    Factors sampled per image; the three ops are applied in a random
    per-image order via lax.switch over the 6 permutations.
    """
    b = x.shape[0]
    kb, kc, ks, ko = jax.random.split(key, 4)
    fb = jax.random.uniform(kb, (b,), minval=max(0.0, 1 - brightness),
                            maxval=1 + brightness)
    fc = jax.random.uniform(kc, (b,), minval=max(0.0, 1 - contrast),
                            maxval=1 + contrast)
    fs = jax.random.uniform(ks, (b,), minval=max(0.0, 1 - saturation),
                            maxval=1 + saturation)
    order = jax.random.randint(ko, (b,), 0, 6)

    def apply_brightness(img, f):
        return jnp.clip(img * f, 0.0, 1.0)

    def apply_contrast(img, f):
        mean = jnp.mean(_grayscale(img))
        return jnp.clip(img * f + (1 - f) * mean, 0.0, 1.0)

    def apply_saturation(img, f):
        gray = _grayscale(img)[..., None]
        return jnp.clip(img * f + (1 - f) * gray, 0.0, 1.0)

    perms = [(0, 1, 2), (0, 2, 1), (1, 0, 2), (1, 2, 0), (2, 0, 1), (2, 1, 0)]
    ops = [apply_brightness, apply_contrast, apply_saturation]

    def one(img, f_b, f_c, f_s, o):
        fs_by_op = (f_b, f_c, f_s)

        def perm_branch(p):
            def run(img):
                for idx in p:
                    img = ops[idx](img, fs_by_op[idx])
                return img
            return run

        return jax.lax.switch(o, [perm_branch(p) for p in perms], img)

    return jax.vmap(one)(x, fb, fc, fs, order)


def random_resized_crop(key, x, *, size: tuple[int, int] = (144, 256),
                        scale: tuple[float, float] = (0.5, 1.0),
                        ratio: tuple[float, float] = (1.77, 1.78)):
    """Batched RandomResizedCrop (learn_contrasts.py:52-55 parameters).

    Crop box sampled in the input, then bilinearly resampled to ``size`` —
    both expressed as one affine gather so shapes stay static.
    """
    b, h, w = x.shape[0], x.shape[1], x.shape[2]
    out_h, out_w = size
    k1, k2, k3, k4 = jax.random.split(key, 4)
    area = h * w
    target_area = jax.random.uniform(k1, (b,), minval=scale[0],
                                     maxval=scale[1]) * area
    log_ratio = jax.random.uniform(
        k2, (b,), minval=math.log(ratio[0]), maxval=math.log(ratio[1]))
    aspect = jnp.exp(log_ratio)
    cw = jnp.clip(jnp.sqrt(target_area * aspect), 1.0, w)
    ch = jnp.clip(jnp.sqrt(target_area / aspect), 1.0, h)
    x0 = jax.random.uniform(k3, (b,)) * (w - cw)
    y0 = jax.random.uniform(k4, (b,)) * (h - ch)

    ys_unit = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) / out_h
    xs_unit = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) / out_w

    def one(img, y0i, x0i, chi, cwi):
        ys = y0i + ys_unit * chi - 0.5
        xs = x0i + xs_unit * cwi - 0.5
        grid_y = jnp.broadcast_to(ys[:, None], (out_h, out_w))
        grid_x = jnp.broadcast_to(xs[None, :], (out_h, out_w))
        return _gather_bilinear(img, grid_y, grid_x)

    return jax.vmap(one)(x, y0, x0, ch, cw)


@functools.partial(jax.jit, static_argnames=("size",))
def simclr_augment(key, x_u8, size: tuple[int, int] = (144, 256)):
    """The reference's full transform pipeline, once: uint8 RGB -> float view."""
    x = x_u8.astype(jnp.float32) / 255.0
    k1, k2, k3 = jax.random.split(key, 3)
    x = random_affine(k1, x)
    x = color_jitter(k2, x)
    x = random_resized_crop(k3, x, size=size)
    return x


def simclr_two_views(key, x_u8, size: tuple[int, int] = (144, 256)):
    """Two independent augmented views (frameID/data.py:86-93 applies the
    same pipeline twice), concatenated along batch like learn_contrasts.py:105."""
    ka, kb = jax.random.split(key)
    v1 = simclr_augment(ka, x_u8, size)
    v2 = simclr_augment(kb, x_u8, size)
    return jnp.concatenate([v1, v2], axis=0)
