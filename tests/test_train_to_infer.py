"""Full lifecycle integration: train -> save triplet -> segment a video.

The reference's training and inference scripts only connect through the
hand-copied prod_net checkpoint; here the whole loop runs in one test:
a classifier trained from scratch on synthetic frames is saved in the
triplet contract and drives the segment_video CLI end to end.
"""

import csv
import os

import numpy as np
import pytest

import jax


@pytest.fixture(scope="module")
def trained_model_dir(tmp_path_factory):
    cv2 = pytest.importorskip("cv2")
    root = tmp_path_factory.mktemp("lifecycle")
    data = root / "frames"
    data.mkdir()
    rng = np.random.default_rng(0)
    # 90 frames: three visually distinct classes.
    colors = {(0, "a22"): (40, 160, 40), (1, "ez"): (160, 40, 40),
              (2, "b"): (10, 10, 10)}
    rows = []
    i = 0
    for (cid, name), color in colors.items():
        rows.append((i, name))
        for _ in range(30):
            # Train at the inference resolution (video resized to 256x144).
            img = np.full((144, 256, 3), color, np.uint8)
            img = cv2.add(img, rng.integers(0, 25, (144, 256, 3)).astype(np.uint8))
            cv2.imwrite(str(data / f"frame_{i:07}.jpg"), img)
            i += 1
    with open(data / "frames.csv", "w", newline="") as f:
        w = csv.writer(f)
        for r in rows:
            w.writerow(r)

    from cut_detection_tpu.cli.train_supervised import main as train_main

    model_dir = root / "models"
    train_main(["--data-dirs", str(data), "--conv-hidden-channels", "8",
                "--conv-layers", "2", "--avg-pool-size", "2",
                "--linear-size", "8", "--batch-size", "16", "--epochs", "30",
                "--learning-rate", "3e-3", "--write-every-n", "100",
                "--model-dir", str(model_dir), "--checkpoint-every-n", "0",
                "--num-workers", "0"])
    return str(model_dir), colors


def test_contrastive_embedding_lifecycle(trained_model_dir, tmp_path):
    """Contrastive pretrain -> saved pair + sidecar -> batched embedding
    inference (BASELINE.md config #3)."""
    model_dir, _ = trained_model_dir
    data_dir = os.path.join(os.path.dirname(model_dir), "frames")

    from cut_detection_tpu.cli.train_contrastive import main as tc_main

    emb_dir = str(tmp_path / "emb")
    tc_main(["--cpu", "--data-dir", data_dir, "--conv-hidden-channels", "8",
             "--conv-layers", "2", "--linear-size", "8",
             "--output-size", "4", "--batch-size", "8", "--epochs", "1",
             "--write-every-n", "100", "--model-dir", emb_dir,
             "--num-workers", "0"])

    from cut_detection_tpu.models.assembly import load_embedding_net

    net, params = load_embedding_net(emb_dir)
    assert params["linear_output_size"] == 4
    rng = np.random.default_rng(0)
    x = rng.random((6, 72, 96, 3), dtype=np.float32)
    emb = np.asarray(net(x))
    assert emb.shape == (6, 4)
    assert np.isfinite(emb).all()

    # The embed CLI over the frame directory.
    from cut_detection_tpu.cli.embed_frames import main as embed_main

    out = str(tmp_path / "emb.npz")
    embed_main([data_dir, "--model-dir", emb_dir, "--output", out,
                "--batch-size", "32", "--frame-limit", "50", "--cpu"])
    with np.load(out) as z:
        assert z["embeddings"].shape == (50, 4)


def test_trained_triplet_segments_video(trained_model_dir, tmp_path):
    cv2 = pytest.importorskip("cv2")
    model_dir, colors = trained_model_dir

    # A video alternating the three learned classes in long blocks.
    video = str(tmp_path / "v.mp4")
    wr = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"mp4v"), 30, (640, 360))
    rng = np.random.default_rng(1)
    order = [(40, "a22"), (40, "b"), (40, "ez")]
    by_name = {name: c for (cid, name), c in colors.items()}
    for n, name in order:
        # Video frames are BGR; training images were written via imwrite
        # (also BGR), so use the same raw color tuples.
        base = np.full((360, 640, 3), by_name[name], np.uint8)
        for _ in range(n):
            wr.write(cv2.add(base, rng.integers(0, 25, (360, 640, 3)).astype(np.uint8)))
    wr.release()

    from cut_detection_tpu.cli.segment_video import main as sv_main

    out = str(tmp_path / "segs.csv")
    sv_main([video, "--output_path", out, "--model-dir", model_dir,
             "--batch-size", "32", "--base-threshold", "10",
             "--blank-threshold", "5", "--print-every", "0", "--cpu"])

    with open(out, newline="") as f:
        segs = [(int(r[0]), r[1]) for r in csv.reader(f)]
    # The trained model must recover the three blocks (allow boundary
    # wobble of a few frames, but the structure must be exact).
    assert [lab for _, lab in segs] == ["a22", "b", "ez"]
    assert segs[0][0] == 0
    assert abs(segs[1][0] - 40) <= 5
    assert abs(segs[2][0] - 80) <= 5

    # Close the loop with the evaluation tool against the known truth.
    truth = str(tmp_path / "truth.csv")
    with open(truth, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow([0, "a22"])
        w.writerow([40, "b"])
        w.writerow([80, "ez"])
    from cut_detection_tpu.cli.evaluate import evaluate

    scores = evaluate(out, truth, num_frames=120, tolerance=5)
    assert scores["frame_accuracy"] > 0.9
    assert scores["boundary_recall"] == 1.0


def test_warm_start_from_contrastive_pretrain(trained_model_dir, tmp_path):
    """The reference's full training workflow: SimCLR pretrain of the
    conv backbone, then supervised training warm-started from it via
    --load-conv-net (supervised_training.py:105-110 contract: the conv
    npz the contrastive CLI saves is exactly what the supervised CLI
    loads).  Run the supervised pass with lr=0 so the saved conv params
    must equal the pretrained ones bit-for-bit — proving the warm start
    actually flowed into the train state rather than being re-inited."""
    model_dir, _ = trained_model_dir
    data_dir = os.path.join(os.path.dirname(model_dir), "frames")

    from cut_detection_tpu.cli.train_contrastive import main as tc_main
    from cut_detection_tpu.cli.train_supervised import main as ts_main

    wdir = str(tmp_path / "warm")
    tc_main(["--cpu", "--data-dir", data_dir, "--conv-hidden-channels", "8",
             "--conv-layers", "2", "--linear-size", "8",
             "--output-size", "4", "--batch-size", "8", "--epochs", "1",
             "--write-every-n", "100", "--model-dir", wdir,
             "--model-name", "pre", "--num-workers", "0"])

    from cut_detection_tpu.checkpoint.io import load_bundle

    pre_conv = load_bundle(os.path.join(wdir, "pre_conv.npz"))
    pre_kernels = [np.asarray(p["kernel"]) for p in pre_conv["params"]]

    # Supervised training over the SAME model-dir/name (the reference
    # reads and writes the same location); lr=0 + wd=0 freezes params.
    ts_main(["--cpu", "--data-dirs", data_dir, "--conv-hidden-channels",
             "8", "--conv-layers", "2", "--avg-pool-size", "2",
             "--linear-size", "8", "--batch-size", "16", "--epochs", "1",
             "--learning-rate", "0", "--weight-decay", "0",
             "--write-every-n", "100", "--model-dir", wdir,
             "--model-name", "pre", "--load-conv-net",
             "--checkpoint-every-n", "0", "--num-workers", "0"])

    post_conv = load_bundle(os.path.join(wdir, "pre_conv.npz"))
    post_kernels = [np.asarray(p["kernel"]) for p in post_conv["params"]]
    assert len(pre_kernels) == len(post_kernels)
    for a, b in zip(pre_kernels, post_kernels):
        np.testing.assert_array_equal(a, b)

    # And the warm-started triplet is loadable for inference.
    from cut_detection_tpu.models.assembly import load_triplet_or_default

    net, _ = load_triplet_or_default(wdir, "pre")
    rng = np.random.default_rng(0)
    x = rng.random((4, 72, 96, 3), dtype=np.float32)
    logits = np.asarray(net(x))
    assert logits.shape == (4, 3)
    assert np.isfinite(logits).all()
