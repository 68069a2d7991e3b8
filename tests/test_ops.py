"""Op-level parity tests against torch semantics (frameID/net.py modules)."""

import numpy as np
import pytest

import jax.numpy as jnp

from cut_detection_tpu.ops.nn import (
    adaptive_avg_pool,
    batch_norm_infer,
    batch_norm_train,
    conv2d_same,
    flatten_nchw_order,
    max_pool,
)


def _rand(rng, *shape):
    return rng.standard_normal(shape).astype(np.float32)


@pytest.mark.parametrize("h,w,cin,cout", [(16, 20, 3, 8), (9, 9, 4, 4)])
def test_conv2d_same_matches_torch(torch, h, w, cin, cout):
    rng = np.random.default_rng(0)
    x = _rand(rng, 2, h, w, cin)
    k = _rand(rng, 3, 3, cin, cout)
    b = _rand(rng, cout)
    ours = np.asarray(conv2d_same(jnp.asarray(x), jnp.asarray(k), jnp.asarray(b)))
    conv = torch.nn.Conv2d(cin, cout, 3, padding=1)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(k.transpose(3, 2, 0, 1)))
        conv.bias.copy_(torch.from_numpy(b))
        ref = conv(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref, atol=1e-5)


@pytest.mark.parametrize("h,w", [(144, 256), (48, 85), (16, 28), (7, 11)])
def test_max_pool_matches_torch(torch, h, w):
    rng = np.random.default_rng(1)
    x = _rand(rng, 2, h, w, 5)
    ours = np.asarray(max_pool(jnp.asarray(x)))
    ref = torch.nn.MaxPool2d(kernel_size=3)(
        torch.from_numpy(x.transpose(0, 3, 1, 2))
    ).numpy()
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref, atol=0)


@pytest.mark.parametrize("h,w,out", [(5, 9, 4), (5, 9, 1), (12, 12, 4),
                                     (4, 4, 4), (7, 3, 2)])
def test_adaptive_avg_pool_matches_torch(torch, h, w, out):
    rng = np.random.default_rng(2)
    x = _rand(rng, 3, h, w, 6)
    ours = np.asarray(adaptive_avg_pool(jnp.asarray(x), out))
    ref = torch.nn.AdaptiveAvgPool2d(out)(
        torch.from_numpy(x.transpose(0, 3, 1, 2))
    ).numpy()
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref, atol=1e-6)


def test_flatten_nchw_order(torch):
    rng = np.random.default_rng(3)
    x = _rand(rng, 2, 4, 4, 5)
    ours = np.asarray(flatten_nchw_order(jnp.asarray(x)))
    ref = torch.reshape(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), [2, -1]
    ).numpy()
    np.testing.assert_array_equal(ours, ref)


def test_batch_norm_infer_matches_torch(torch):
    rng = np.random.default_rng(4)
    c = 6
    x = _rand(rng, 2, 8, 8, c)
    mean, var = _rand(rng, c), np.abs(_rand(rng, c)) + 0.5
    gamma, beta = _rand(rng, c), _rand(rng, c)
    ours = np.asarray(batch_norm_infer(
        jnp.asarray(x), jnp.asarray(mean), jnp.asarray(var),
        jnp.asarray(gamma), jnp.asarray(beta)))
    bn = torch.nn.BatchNorm2d(c).eval()
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(gamma))
        bn.bias.copy_(torch.from_numpy(beta))
        bn.running_mean.copy_(torch.from_numpy(mean))
        bn.running_var.copy_(torch.from_numpy(var))
        ref = bn(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref, atol=1e-5)


def test_batch_norm_train_matches_torch(torch):
    rng = np.random.default_rng(5)
    c = 6
    x = _rand(rng, 4, 8, 8, c)
    mean0, var0 = _rand(rng, c), np.abs(_rand(rng, c)) + 0.5
    gamma, beta = _rand(rng, c), _rand(rng, c)
    y, new_mean, new_var = batch_norm_train(
        jnp.asarray(x), jnp.asarray(mean0), jnp.asarray(var0),
        jnp.asarray(gamma), jnp.asarray(beta))
    bn = torch.nn.BatchNorm2d(c).train()
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(gamma))
        bn.bias.copy_(torch.from_numpy(beta))
        bn.running_mean.copy_(torch.from_numpy(mean0))
        bn.running_var.copy_(torch.from_numpy(var0))
    ref = bn(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy()
    np.testing.assert_allclose(
        np.asarray(y).transpose(0, 3, 1, 2), ref, atol=1e-5)
    # Running stats: torch updates with the unbiased batch variance.
    np.testing.assert_allclose(np.asarray(new_mean),
                               bn.running_mean.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_var),
                               bn.running_var.numpy(), atol=1e-5)


def test_batch_norm_train_1d_matches_torch(torch):
    rng = np.random.default_rng(6)
    f = 10
    x = _rand(rng, 16, f)
    mean0, var0 = np.zeros(f, np.float32), np.ones(f, np.float32)
    gamma, beta = _rand(rng, f), _rand(rng, f)
    y, new_mean, new_var = batch_norm_train(
        jnp.asarray(x), jnp.asarray(mean0), jnp.asarray(var0),
        jnp.asarray(gamma), jnp.asarray(beta))
    bn = torch.nn.BatchNorm1d(f).train()
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(gamma))
        bn.bias.copy_(torch.from_numpy(beta))
    ref = bn(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_mean),
                               bn.running_mean.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_var),
                               bn.running_var.numpy(), atol=1e-5)
