"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cut_detection_tpu.parallel.mesh import make_mesh, mesh_shape_for
from cut_detection_tpu.parallel.sharding import (
    make_sharded_classify_step,
    replicate,
    shard_batch,
    shard_bundle,
)

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs 8 virtual devices")


def test_mesh_shape_for():
    assert mesh_shape_for(8, 1) == (8, 1)
    assert mesh_shape_for(8, 2) == (4, 2)
    with pytest.raises(ValueError):
        mesh_shape_for(8, 3)


@needs_8
def test_data_parallel_classify_matches_single_device():
    from cut_detection_tpu.models.assembly import load_default_net

    net, _ = load_default_net()
    mesh = make_mesh(jax.devices()[:8])
    step = make_sharded_classify_step(net, mesh)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, size=(16, 36, 64, 3), dtype=np.uint8)
    bundle = replicate(mesh, net.bundle)
    conf, pred = step(bundle, shard_batch(mesh, frames))

    # Single-device baseline through the plain pipeline step.
    from cut_detection_tpu.pipeline import make_classify_step

    sstep = make_classify_step(net)
    conf1, pred1 = sstep(net.bundle, frames)
    np.testing.assert_allclose(np.asarray(conf), np.asarray(conf1), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(pred), np.asarray(pred1))


@needs_8
def test_data_parallel_int8_rung_matches_single_device():
    """The integer-conv rung composes with mesh sharding: int8
    activations shard over the data axis exactly like the float rungs
    (the GSPMD partitioner handles integer dtypes the same way)."""
    from cut_detection_tpu.models.assembly import load_default_net

    from cut_detection_tpu.models.assembly import _glued_apply
    from cut_detection_tpu.ops.preprocess import normalize_frames

    net, _ = load_default_net(precision="int8_mxu")
    mesh = make_mesh(jax.devices()[:8])
    step = make_sharded_classify_step(net, mesh)
    rng = np.random.default_rng(2)
    frames = rng.integers(0, 256, size=(16, 36, 64, 3), dtype=np.uint8)
    bundle = replicate(mesh, net.bundle)
    conf, pred = step(bundle, shard_batch(mesh, frames))

    # Single-device baseline through the SAME code path, JITTED (the
    # sharded step normalizes explicitly, and XLA's fused rounding at
    # the rint quantization boundaries differs from eager by up to one
    # quantization step — so the honest comparison is jit vs jit).
    # Even jit-vs-jit, the two partitionings may fuse the ring-add into
    # the rint input differently and land single elements one
    # quantization step apart (observed: 1/16 elements at 2.4e-5 when
    # the strip-ring landed), so the conf tolerance is one quantization
    # step's worth of logit movement, far under the rung's ~1e-2
    # relative accuracy gate; pred must still match exactly.
    logits1 = jax.jit(lambda b, u8: _glued_apply(
        b, normalize_frames(u8), conv_cfg=net.conv_cfg,
        linear_cfg=net.linear_cfg,
        compute_dtype=net.compute_dtype))(net.bundle, frames)
    conf1 = np.max(np.asarray(logits1), axis=1)
    pred1 = np.argmax(np.asarray(logits1), axis=1)
    np.testing.assert_allclose(np.asarray(conf), conf1, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(pred), pred1)


@needs_8
def test_data_parallel_int8_fold_path_matches_single_device():
    """The PRODUCTION multi-chip route for the int8 rung: the pipeline
    classify step (fold_preprocess + raw uint8 frames, so layer 1 runs
    the uint8->int8 shift + int8 conv) jitted WITH a mesh must match the
    same step without one — GSPMD partitioning of the integer layer-1
    graph included."""
    from cut_detection_tpu.models.assembly import load_default_net
    from cut_detection_tpu.pipeline import make_classify_step

    net, _ = load_default_net(precision="int8_mxu")
    mesh = make_mesh(jax.devices()[:8])
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, size=(16, 36, 64, 3), dtype=np.uint8)
    conf_m, pred_m = make_classify_step(net, mesh=mesh)(net.bundle, frames)
    conf_1, pred_1 = make_classify_step(net)(net.bundle, frames)
    np.testing.assert_allclose(np.asarray(conf_m), np.asarray(conf_1),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(pred_m), np.asarray(pred_1))


@needs_8
def test_tensor_parallel_classify_matches_replicated():
    from cut_detection_tpu.models.assembly import load_default_net

    net, _ = load_default_net()
    mesh = make_mesh(jax.devices()[:8], model_parallel=2)
    bundle_tp = shard_bundle(mesh, net.bundle, tensor_parallel=True)
    step_tp = make_sharded_classify_step(net, mesh, tensor_parallel=True)
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 256, size=(8, 36, 64, 3), dtype=np.uint8)
    conf_tp, pred_tp = step_tp(bundle_tp, shard_batch(mesh, frames))

    from cut_detection_tpu.pipeline import make_classify_step

    sstep = make_classify_step(net)
    conf, pred = sstep(net.bundle, frames)
    np.testing.assert_allclose(np.asarray(conf_tp), np.asarray(conf),
                               atol=1e-4)
    np.testing.assert_array_equal(np.asarray(pred_tp), np.asarray(pred))


@needs_8
def test_data_parallel_train_step_matches_single_device():
    from cut_detection_tpu.config import TrainConfig
    from cut_detection_tpu.train.supervised import (
        init_train_state,
        jit_steps,
        make_train_step,
    )

    cfg = TrainConfig(conv_layers=2, conv_hidden_channels=8, avg_pool_size=2,
                      linear_layers=2, linear_size=8, output_size=3,
                      batch_size=16, epochs=1)
    mesh = make_mesh(jax.devices()[:8])
    train_sharded, _, _ = jit_steps(cfg, mesh)
    step_single, _ = make_train_step(cfg)
    step_single = jax.jit(step_single)

    rng = np.random.default_rng(2)
    x = rng.integers(0, 255, size=(16, 27, 48, 3), dtype=np.uint8)
    y = rng.integers(0, 3, size=(16,)).astype(np.int64)

    # Separate (identical) states: the sharded step donates its input
    # buffers, which may alias a shared init.
    state_a = init_train_state(jax.random.PRNGKey(0), cfg)
    state_b = init_train_state(jax.random.PRNGKey(0), cfg)
    s_sh, m_sh = train_sharded(replicate(mesh, state_a),
                               shard_batch(mesh, x), shard_batch(mesh, y))
    s_1, m_1 = step_single(state_b, x, y)

    # Global-batch BN + global grad reduction == the single-device step.
    assert float(m_sh["loss"]) == pytest.approx(float(m_1["loss"]), rel=1e-5)
    # Params: a first AdamW step is ~sign(g)*lr, so float reduction-order
    # noise on near-zero grads legitimately moves params by O(lr).  Bound
    # by 2*lr rather than exact equality.
    for a, b in zip(jax.tree_util.tree_leaves(s_sh["params"]),
                    jax.tree_util.tree_leaves(s_1["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)
    # BN running stats are pure global-batch moments — those match tightly.
    for a, b in zip(jax.tree_util.tree_leaves(s_sh["bn_state"]),
                    jax.tree_util.tree_leaves(s_1["bn_state"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@needs_8
def test_train_supervised_loop_over_mesh(tmp_path):
    """The full training loop (loader -> sharded step -> eval) on the
    virtual mesh."""
    import csv

    import cv2

    from cut_detection_tpu.config import TrainConfig
    from cut_detection_tpu.data.frames import SupervisedFrameDataset
    from cut_detection_tpu.train.supervised import train_supervised

    data = tmp_path / "frames"
    data.mkdir()
    rng = np.random.default_rng(0)
    with open(data / "frames.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow([0, "a22"])
        w.writerow([16, "b"])
    for i in range(32):
        cv2.imwrite(str(data / f"frame_{i:07}.jpg"),
                    rng.integers(0, 255, (18, 24, 3)).astype(np.uint8))

    cfg = TrainConfig(conv_layers=2, conv_hidden_channels=8, avg_pool_size=2,
                      linear_layers=2, linear_size=8, output_size=3,
                      batch_size=8, epochs=1)
    mesh = make_mesh(jax.devices()[:8])
    result = train_supervised(
        cfg, [SupervisedFrameDataset(str(data), "frames.csv")],
        mesh=mesh, num_workers=0)
    assert len(result["history"]) == 1
    assert np.isfinite(result["history"][0]["train_loss"])


@needs_8
def test_graft_dryrun_multichip():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_graft_entry_single_device():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "graft_entry2", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 3)
