"""On-device augmentation behavior tests (train/augment.py)."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from cut_detection_tpu.train.augment import (
    color_jitter,
    random_affine,
    random_resized_crop,
    simclr_augment,
    simclr_two_views,
)


def _frames(b=4, h=72, w=128):
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.random((b, h, w, 3), dtype=np.float32))


def test_random_affine_shapes_and_range():
    x = _frames()
    out = random_affine(jax.random.PRNGKey(0), x)
    assert out.shape == x.shape
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_random_affine_identity_params():
    # degrees=0, translate=0, scale=(1,1) must be an exact no-op.
    x = _frames()
    out = random_affine(jax.random.PRNGKey(0), x, degrees=0.0,
                        translate=(0.0, 0.0), scale=(1.0, 1.0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_affine_transform_integer_translation():
    from cut_detection_tpu.train.augment import affine_transform

    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.random((16, 20, 3), dtype=np.float32))
    # Shift content right by 4 pixels: out[y, x] = in[y, x-4].
    out = np.asarray(affine_transform(img, 0.0, (4.0, 0.0), 1.0))
    np.testing.assert_allclose(out[:, 4:], np.asarray(img)[:, :-4], atol=1e-6)
    np.testing.assert_allclose(out[:, :4], 0.0)  # zero fill


def test_affine_transform_180_rotation():
    from cut_detection_tpu.train.augment import affine_transform

    rng = np.random.default_rng(6)
    img = jnp.asarray(rng.random((15, 21, 3), dtype=np.float32))
    out = np.asarray(affine_transform(img, np.pi, (0.0, 0.0), 1.0))
    # 180-degree rotation about the center == flip both spatial axes
    # (odd dims keep the center pixel fixed).
    np.testing.assert_allclose(out, np.asarray(img)[::-1, ::-1], atol=1e-5)


def test_affine_transform_scale_zoom():
    from cut_detection_tpu.train.augment import affine_transform

    # Zoom x2 on a centered bright square: the square's extent doubles.
    img = np.zeros((20, 20, 1), np.float32)
    img[8:12, 8:12] = 1.0
    out = np.asarray(affine_transform(jnp.asarray(img), 0.0, (0.0, 0.0), 2.0))
    assert out.sum() == pytest.approx(4 * img.sum(), rel=0.3)


def test_color_jitter_range_and_variation():
    x = _frames()
    out = color_jitter(jax.random.PRNGKey(1), x)
    assert out.shape == x.shape
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
    assert not np.allclose(np.asarray(out), np.asarray(x))


def test_color_jitter_zero_strength_is_identity():
    x = _frames()
    out = color_jitter(jax.random.PRNGKey(1), x, brightness=0.0, contrast=0.0,
                       saturation=0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_random_resized_crop_output_size():
    x = _frames(h=90, w=160)
    out = random_resized_crop(jax.random.PRNGKey(2), x, size=(36, 64))
    assert out.shape == (4, 36, 64, 3)


def test_random_resized_crop_full_box_is_resize():
    # scale=(1,1) with the image's own aspect ratio -> whole-image resize.
    x = _frames(h=72, w=128)
    out = random_resized_crop(jax.random.PRNGKey(3), x, size=(72, 128),
                              scale=(1.0, 1.0),
                              ratio=(128 / 72, 128 / 72 + 1e-6))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-2)


# ---------------------------------------------------------------------------
# torchvision-oracle tests (VERDICT r1 item 5): torchvision itself is not in
# the image, so each test transcribes the v0.10 formula (get_params rounding
# rules, _get_inverse_affine_matrix, _blend, crop-then-resize) independently
# into numpy and asserts our ops reproduce it.  Reference semantics:
# /root/reference/training_scripts/learn_contrasts.py:48-56,
# /root/reference/frameID/data.py:86-93.
# ---------------------------------------------------------------------------


def _tv_affine_nearest(img, angle_deg, translate, scale):
    """torchvision F.affine (tensor path) oracle in numpy.

    _get_inverse_affine_matrix with shear=0 about the tensor-path grid
    center ((size-1)/2), nearest sampling, zero fill.
    """
    import math

    h, w = img.shape[:2]
    rot = math.radians(angle_deg)
    # RSS^-1 with shear=0 == [cos, sin; -sin, cos] / scale
    m = [math.cos(rot) / scale, math.sin(rot) / scale, 0.0,
         -math.sin(rot) / scale, math.cos(rot) / scale, 0.0]
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    tx, ty = translate
    m[2] += m[0] * (-cx - tx) + m[1] * (-cy - ty)
    m[5] += m[3] * (-cx - tx) + m[4] * (-cy - ty)
    m[2] += cx
    m[5] += cy
    out = np.zeros_like(img)
    for y in range(h):
        for x in range(w):
            xs = m[0] * x + m[1] * y + m[2]
            ys = m[3] * x + m[4] * y + m[5]
            xi = int(np.round(xs))
            yi = int(np.round(ys))
            if 0 <= xi < w and 0 <= yi < h:
                out[y, x] = img[yi, xi]
    return out


def test_affine_matches_torchvision_inverse_matrix_formula():
    import math

    from cut_detection_tpu.train.augment import affine_transform

    rng = np.random.default_rng(11)
    img = rng.random((24, 30, 3)).astype(np.float32)
    for angle_deg, translate, scale in [
        (23.0, (7.0, -3.0), 1.2),
        (-11.5, (0.0, 5.0), 1.0),
        (15.0, (-4.0, -2.0), 1.37),
    ]:
        expected = _tv_affine_nearest(img, angle_deg, translate, scale)
        got = np.asarray(affine_transform(
            jnp.asarray(img), math.radians(angle_deg), translate, scale))
        np.testing.assert_allclose(got, expected, atol=1e-6,
                                   err_msg=f"{angle_deg} {translate} {scale}")


def test_affine_params_integer_translations():
    """RandomAffine.get_params rounds translations to integer pixels
    (torchvision v0.10: tx = int(round(uniform(-max_dx, max_dx))))."""
    from cut_detection_tpu.train.augment import affine_params

    angles, tx, ty, scales = affine_params(
        jax.random.PRNGKey(0), 512, 256, 144)
    tx, ty = np.asarray(tx), np.asarray(ty)
    np.testing.assert_array_equal(tx, np.round(tx))
    np.testing.assert_array_equal(ty, np.round(ty))
    assert np.abs(tx).max() <= 0.2 * 256 + 0.5
    assert np.abs(ty).max() <= 0.2 * 144 + 0.5
    assert (tx != 0).any() and (ty != 0).any()
    a = np.asarray(angles)
    assert np.abs(a).max() <= np.radians(15.0)
    s = np.asarray(scales)
    assert s.min() >= 1.0 and s.max() <= 1.4


def test_rrc_params_box_contract():
    """get_params returns integer boxes inside the image with inclusive
    uniform offsets; ratio/area honor the requested bands up to the
    documented integer rounding."""
    from cut_detection_tpu.train.augment import resized_crop_params

    H, W = 360, 640
    i, j, ch, cw = resized_crop_params(jax.random.PRNGKey(1), 2000, H, W)
    i, j, ch, cw = (np.asarray(v) for v in (i, j, ch, cw))
    assert i.dtype == np.int32 and cw.dtype == np.int32
    assert (0 < cw).all() and (cw <= W).all()
    assert (0 < ch).all() and (ch <= H).all()
    assert (0 <= i).all() and (i <= H - ch).all()
    assert (0 <= j).all() and (j <= W - cw).all()
    # Aspect band (1.77, 1.78) up to rounding of w and h to integers.
    r = cw / ch
    assert r.min() > 1.77 - 0.02 and r.max() < 1.78 + 0.02
    # Area band [0.5, 1.0] * H*W up to the same rounding.
    frac = (cw * ch) / (H * W)
    assert frac.min() > 0.5 - 0.02 and frac.max() <= 1.0 + 0.02
    # Offsets are uniform over the INCLUSIVE range: extremes are reachable.
    assert i.min() == 0 and j.min() == 0
    assert (i == H - ch).any() and (j == W - cw).any()


def test_rrc_center_crop_fallback():
    """10 failed tries -> torchvision's central-crop fallback, computed by
    hand for a square input and the (1.77, 1.78) ratio band:
    in_ratio 1.0 < 1.77 so w=W, h=round(W/1.77), centered."""
    from cut_detection_tpu.train.augment import resized_crop_params

    H = W = 100
    # scale (0.99, 1.0): every candidate has w=round(sqrt(~10000*1.77)) >
    # 100, so all 10 tries fail for every image.
    i, j, ch, cw = resized_crop_params(jax.random.PRNGKey(2), 64, H, W,
                                       scale=(0.99, 1.0))
    assert (np.asarray(cw) == 100).all()
    assert (np.asarray(ch) == round(100 / 1.77)).all()  # == 56
    assert (np.asarray(i) == (100 - 56) // 2).all()
    assert (np.asarray(j) == 0).all()


def test_resized_crop_bilinear_halfpixel_formula():
    """Deterministic crop+resize vs the crop-then-resize oracle:
    src = (dst+0.5)*crop/out - 0.5 clamped into the CROP (not the image),
    bilinear (align_corners=False)."""
    from cut_detection_tpu.train.augment import resized_crop

    rng = np.random.default_rng(12)
    img = rng.random((50, 80, 3)).astype(np.float32)
    i, j, ch, cw = 7, 11, 31, 55
    out_h, out_w = 14, 24
    crop = img[i:i + ch, j:j + cw]
    expected = np.zeros((out_h, out_w, 3), np.float32)
    for y in range(out_h):
        sy = min(max((y + 0.5) * ch / out_h - 0.5, 0.0), ch - 1)
        y0 = int(np.floor(sy)); y1 = min(y0 + 1, ch - 1); fy = sy - y0
        for x in range(out_w):
            sx = min(max((x + 0.5) * cw / out_w - 0.5, 0.0), cw - 1)
            x0 = int(np.floor(sx)); x1 = min(x0 + 1, cw - 1); fx = sx - x0
            top = crop[y0, x0] * (1 - fx) + crop[y0, x1] * fx
            bot = crop[y1, x0] * (1 - fx) + crop[y1, x1] * fx
            expected[y, x] = top * (1 - fy) + bot * fy
    got = np.asarray(resized_crop(jnp.asarray(img), i, j, ch, cw,
                                  (out_h, out_w)))
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_color_jitter_op_formulas():
    """Single-op math vs torchvision _blend formulas (float path)."""
    from cut_detection_tpu.train.augment import (
        adjust_brightness,
        adjust_contrast,
        adjust_saturation,
    )

    rng = np.random.default_rng(13)
    img = rng.random((20, 25, 3)).astype(np.float32)
    gray = (0.2989 * img[..., 0] + 0.587 * img[..., 1]
            + 0.114 * img[..., 2])
    for f in (0.7, 1.3):
        np.testing.assert_allclose(
            np.asarray(adjust_brightness(jnp.asarray(img), f)),
            np.clip(img * f, 0, 1), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(adjust_contrast(jnp.asarray(img), f)),
            np.clip(img * f + (1 - f) * gray.mean(), 0, 1), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(adjust_saturation(jnp.asarray(img), f)),
            np.clip(img * f + (1 - f) * gray[..., None], 0, 1), atol=1e-6)


def test_simclr_views_differ_and_are_deterministic():
    rng = np.random.default_rng(3)
    x_u8 = jnp.asarray(rng.integers(0, 256, size=(2, 90, 160, 3),
                                    dtype=np.uint8))
    key = jax.random.PRNGKey(7)
    views = simclr_two_views(key, x_u8, size=(36, 64))
    assert views.shape == (4, 36, 64, 3)
    v1, v2 = np.asarray(views[:2]), np.asarray(views[2:])
    assert not np.allclose(v1, v2)  # independent augmentations
    views_again = simclr_two_views(key, x_u8, size=(36, 64))
    np.testing.assert_allclose(np.asarray(views), np.asarray(views_again))


def test_simclr_augment_jit_under_vary_key():
    rng = np.random.default_rng(4)
    x_u8 = jnp.asarray(rng.integers(0, 256, size=(2, 90, 160, 3),
                                    dtype=np.uint8))
    a = simclr_augment(jax.random.PRNGKey(0), x_u8, (36, 64))
    b = simclr_augment(jax.random.PRNGKey(1), x_u8, (36, 64))
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_fast_augment_spatial_composition_exact():
    """The composed affine+crop gather is SPATIALLY bitwise-equal to
    crop(affine(x)): bilinear taps of a nearest-sampled image equal
    direct taps at the composed positions (incl. zero fill and the
    crop-box clamp)."""
    from cut_detection_tpu.train.augment import (
        _composed_view,
        affine_params,
        affine_transform,
        resized_crop,
        resized_crop_params,
    )

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.random((3, 90, 160, 3), dtype=np.float32))
    k1, k3 = jax.random.split(jax.random.PRNGKey(5))
    angles, tx, ty, scales = affine_params(k1, 3, 160, 90)
    i, j, ch, cw = resized_crop_params(k3, 3, 90, 160)
    for n in range(3):
        exact = resized_crop(
            affine_transform(x[n], angles[n], (tx[n], ty[n]), scales[n]),
            i[n], j[n], ch[n], cw[n], (36, 64))
        fast = _composed_view(x[n], angles[n], (tx[n], ty[n]), scales[n],
                              i[n], j[n], ch[n], cw[n], (36, 64))
        np.testing.assert_allclose(np.asarray(fast), np.asarray(exact),
                                   atol=1e-6)


def test_fast_augment_tracks_exact_distribution():
    """Full fast views vs exact views with the SAME key (identical
    parameter draws): only the documented color-jitter divergences
    remain — small everywhere, tiny on average."""
    from cut_detection_tpu.train.augment import fast_simclr_two_views

    rng = np.random.default_rng(12)
    x_u8 = jnp.asarray(rng.integers(0, 256, size=(4, 90, 160, 3),
                                    dtype=np.uint8))
    key = jax.random.PRNGKey(9)
    exact = np.asarray(simclr_two_views(key, x_u8, size=(36, 64)))
    fast = np.asarray(fast_simclr_two_views(key, x_u8, size=(36, 64)))
    assert fast.shape == exact.shape
    d = np.abs(fast - exact)
    assert d.mean() < 0.02
    assert np.quantile(d, 0.99) < 0.15
    assert d.max() < 0.5


def test_fast_augment_trains():
    """The contrastive step with fast_augment converges like the exact
    one on a stationary objective."""
    from cut_detection_tpu.config import ContrastiveConfig
    from cut_detection_tpu.train.contrastive import (
        init_contrastive_state,
        make_contrastive_step,
    )

    cfg = ContrastiveConfig(conv_layers=2, conv_hidden_channels=8,
                            linear_layers=2, linear_size=8, output_size=8,
                            batch_size=8, epochs=1, fast_augment=True)
    step, _ = make_contrastive_step(cfg, view_size=(36, 64))
    step = jax.jit(step)
    state = init_contrastive_state(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(6)
    x = rng.integers(0, 255, size=(8, 72, 128, 3), dtype=np.uint8)
    key = jax.random.PRNGKey(0)
    first = None
    for _ in range(10):
        state, m = step(state, key, x)
        if first is None:
            first = float(m["loss"])
    assert np.isfinite(float(m["loss"])) and float(m["loss"]) < first
