"""The reference's COMPLETE training workflow, end to end, one command.

Chains every stage a Cut-Detection user runs in production order — the
same path as the reference's scripts, but on the TPU-native stack:

  1. synthesize a labeled "game" video + a held-out eval video
     (naturalistic 1/f-textured content, scripts/make_eval_corpus.py)
  2. split_video        -> frame JPEGs        (training_scripts/split_video.py)
  3. author frames.csv  (stands in for the hand-labelling session the
     reference's labelling UI feeds — labels are known by construction)
  4. train_contrastive  -> SimCLR-pretrained conv backbone
                                        (training_scripts/learn_contrasts.py)
  5. train_supervised --load-conv-net -> warm-started classifier triplet
                                 (training_scripts/supervised_training.py)
  6. segment_video --model-dir -> segments CSV on the HELD-OUT clip
                                                        (segment_video.py)
  7. evaluate           -> frame accuracy / boundary P+R vs designed truth

Emits ONE JSON line with per-stage wall times and the final accuracy, so
a hardware run is a reproducible artifact (docs/PERFORMANCE.md cites one).

Run on the TPU:   PYTHONPATH=/root/.axon_site:/root/repo \
                      python scripts/e2e_workflow_demo.py
Run CPU-only:     PYTHONPATH= python scripts/e2e_workflow_demo.py --cpu

The model shapes are the reference's prod config (48ch x 3 conv layers,
pool 4, FC 768->32->3; supervised_training.py:25-45) unless --small.
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from make_eval_corpus import write_clip, write_truth  # noqa: E402

# Wide-margin palette (probed at model resolution; make_eval_corpus.py)
# so the DESIGNED labels are learnable ground truth, and block lengths
# that are a fixed point of the smoother's default thresholds.
TRAIN_BLOCKS = [
    ("a22", 150, (60, 60, 140)), ("b", 20, (10, 10, 10)),
    ("ez", 150, (160, 160, 30)), ("a22", 140, (0, 60, 120)),
    ("b", 20, (40, 120, 40)), ("ez", 130, (160, 160, 30)),
    ("a22", 140, (80, 140, 200)),
]
EVAL_BLOCKS = [
    ("ez", 140, (160, 160, 30)), ("a22", 150, (0, 60, 120)),
    ("b", 25, (10, 10, 10)), ("a22", 130, (60, 60, 140)),
    ("ez", 140, (160, 160, 30)), ("b", 20, (40, 120, 40)),
    ("a22", 150, (80, 140, 200)),
]


def main() -> None:
    ap = argparse.ArgumentParser(__doc__)
    ap.add_argument("--workdir", default=None,
                    help="Working directory (default: a fresh tempdir).")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--small", action="store_true",
                    help="Tiny model (8ch x 2) for a fast smoke run.")
    ap.add_argument("--contrastive-epochs", type=int, default=1)
    # The reference's 3-epoch default assumes ~150k training frames
    # (supervised_training.py:36-38); this corpus is 750, so more passes
    # reach a comparable optimizer step count (~120 steps).
    ap.add_argument("--supervised-epochs", type=int, default=20)
    ns = ap.parse_args()

    work = ns.workdir or tempfile.mkdtemp(prefix="cutdet_workflow_")
    os.makedirs(work, exist_ok=True)
    frames_dir = os.path.join(work, "frames")
    model_dir = os.path.join(work, "models")
    cpu = ["--cpu"] if ns.cpu else []
    if ns.small:
        conv = ["--conv-hidden-channels", "8", "--conv-layers", "2"]
        sup_shape = conv + ["--avg-pool-size", "2", "--linear-size", "8"]
    else:  # the reference's prod config (supervised_training.py:25-45)
        conv = ["--conv-hidden-channels", "48", "--conv-layers", "3"]
        sup_shape = conv + ["--avg-pool-size", "4", "--linear-size", "32"]

    stages: dict[str, float] = {}

    def stage(name: str):
        class _T:
            def __enter__(self):
                self.t = time.perf_counter()

            def __exit__(self, *a):
                stages[name] = round(time.perf_counter() - self.t, 2)
                print(f"[workflow] {name}: {stages[name]}s", file=sys.stderr)
        return _T()

    # 1. Data: a labeled training "game" and a held-out eval clip.
    with stage("synthesize"):
        train_clip = os.path.join(work, "train_game.mp4")
        eval_clip = os.path.join(work, "eval_game.mp4")
        train_truth = write_clip(train_clip, TRAIN_BLOCKS, seed=11,
                                 natural=True)
        eval_truth_rows = write_clip(eval_clip, EVAL_BLOCKS, seed=23,
                                     natural=True)
        truth_csv = os.path.join(work, "eval_truth.csv")
        write_truth(truth_csv, eval_truth_rows)

    # 2. Frame extraction (split_video.py contract: frame_%07d.jpg).
    with stage("split_video"):
        from cut_detection_tpu.cli.split_video import main as split_main

        split_main([train_clip, frames_dir, "--resize", "256"])

    # 3. Labels: frames.csv range boundaries (frameID/data.py:129-141
    # format) from the designed block truth — the artifact a labelling
    # session produces.
    with open(os.path.join(frames_dir, "frames.csv"), "w", newline="") as f:
        w = csv.writer(f)
        for start, label in train_truth:
            w.writerow([start, label])

    # 4. SimCLR pretrain of the conv backbone.
    with stage("contrastive_pretrain"):
        from cut_detection_tpu.cli.train_contrastive import main as tc_main

        tc_main(cpu + conv + [
            "--data-dir", frames_dir, "--model-dir", model_dir,
            "--model-name", "demo", "--batch-size", "32",
            "--epochs", str(ns.contrastive_epochs), "--fast-augment",
            "--precision", "bfloat16", "--num-workers", "0",
            "--write-every-n", "10",
        ])

    # 5. Supervised training, warm-started from the pretrained conv.
    with stage("supervised_train"):
        from cut_detection_tpu.cli.train_supervised import main as ts_main

        ts_main(cpu + sup_shape + [
            "--data-dirs", frames_dir, "--model-dir", model_dir,
            "--model-name", "demo", "--load-conv-net",
            "--batch-size", "128", "--epochs", str(ns.supervised_epochs),
            "--precision", "bfloat16", "--num-workers", "0",
            "--checkpoint-every-n", "0", "--write-every-n", "5",
        ])

    # 6. Production inference on the held-out clip with the new model.
    with stage("segment_video"):
        from cut_detection_tpu.cli.segment_video import main as sv_main

        out_csv = os.path.join(work, "eval_segments.csv")
        sv_main(cpu + [eval_clip, "--output_path", out_csv,
                       "--model-dir", model_dir, "--model-name", "demo",
                       "--print-every", "0"])

    # 7. Score against the designed truth.
    with stage("evaluate"):
        from cut_detection_tpu.cli.evaluate import evaluate

        n_frames = sum(b[1] for b in EVAL_BLOCKS)
        scores = evaluate(out_csv, truth_csv, num_frames=n_frames,
                          tolerance=15)

    print(json.dumps({
        "workflow": "split -> label -> contrastive -> supervised(warm) "
                    "-> segment -> evaluate",
        "backend": "cpu" if ns.cpu else "device",
        "model": "small" if ns.small else "prod-shape",
        "train_frames": sum(b[1] for b in TRAIN_BLOCKS),
        "eval_frames": n_frames,
        "stages_s": stages,
        "total_s": round(sum(stages.values()), 2),
        "scores": {k: (round(v, 4) if isinstance(v, float) else v)
                   for k, v in scores.items()},
        "workdir": work,
    }))


if __name__ == "__main__":
    main()
