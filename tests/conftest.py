"""Test configuration.

- Forces JAX onto the CPU backend with 8 virtual devices so multi-chip
  sharding logic is exercised without TPU hardware (SURVEY.md §4).
- Provides helpers to import the PyTorch reference implementation from
  /root/reference as a golden oracle.  The reference's ``frameID.data``
  imports torchvision (unavailable in this image), so a minimal stub is
  installed first — only the symbols the reference imports at module scope.
"""

import importlib
import os
import sys
import types

# Must happen before anything imports jax.  Force-set (the image exports
# JAX_PLATFORMS=axon and a sitecustomize registers the axon PJRT plugin in
# every interpreter, so setdefault would not stick).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon sitecustomize may have already pinned the platform config; this
# wins as long as no computation has run yet.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

REFERENCE_DIR = "/root/reference"


def _install_torchvision_stub():
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    transforms = types.ModuleType("torchvision.transforms")

    class Compose:
        def __init__(self, ts):
            self.transforms = ts

        def __call__(self, x):
            for t in self.transforms:
                x = t(x)
            return x

    transforms.Compose = Compose
    io_mod = types.ModuleType("torchvision.io")

    class ImageReadMode:
        UNCHANGED = 0

    def read_image(path, mode=None):
        import cv2
        import torch

        img = cv2.imread(path, cv2.IMREAD_COLOR)[..., ::-1].copy()
        return torch.from_numpy(img.transpose(2, 0, 1))

    io_mod.ImageReadMode = ImageReadMode
    io_mod.read_image = read_image
    tv.transforms = transforms
    tv.io = io_mod
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = transforms
    sys.modules["torchvision.io"] = io_mod


def import_reference(module_name: str):
    """Import a module from the reference repo (golden oracle)."""
    _install_torchvision_stub()
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    return importlib.import_module(module_name)


reference_available = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_DIR),
    reason="reference repo not mounted",
)


@pytest.fixture(scope="session")
def torch():
    return importlib.import_module("torch")


@pytest.fixture(scope="session")
def ref_net(torch):
    """The reference's torch prod classifier in eval mode."""
    net_mod = import_reference("frameID.net")
    net, params = net_mod.load_default_net()
    net.eval()
    return net, params


@pytest.fixture(scope="session")
def synthetic_video(tmp_path_factory):
    """A small synthetic MP4 with visually distinct temporal segments."""
    import cv2

    path = str(tmp_path_factory.mktemp("video") / "clip.mp4")
    w, h, fps = 640, 360, 30
    writer = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
    )
    assert writer.isOpened()
    rng = np.random.default_rng(42)
    # Blocks of frames with different base colors + noise, so the classifier
    # produces varied, temporally-structured predictions.
    blocks = [(60, (40, 120, 40)), (20, (10, 10, 10)), (80, (150, 60, 60)),
              (8, (200, 200, 200)), (72, (60, 60, 140))]
    for n, color in blocks:
        base = np.full((h, w, 3), color, dtype=np.uint8)
        for _ in range(n):
            noise = rng.integers(0, 30, size=(h, w, 3), dtype=np.uint8)
            writer.write(cv2.add(base, noise))
    writer.release()
    return path
