"""Auto-probe for the Mosaic lane-strided-load regression (ROADMAP #5).

Round 3 found the relay image's Mosaic toolchain dropped lane-strided
vector loads, which broke HARDWARE compilation of the round-2 kernels
``ops/pallas/fused_conv1.py`` and ``fused_conv_block.py`` (their
interpret-mode tests still pin semantics).  This probe makes the
toolchain state visible every run instead of rotting silently:

- On the CPU test mesh it SKIPS, printing the toolchain version it
  could not probe (hardware Mosaic compilation needs the chip).
- On a TPU it attempts the real compile.  Today that FAILS -> the
  xfail marker records the known regression.  The day a new image
  restores lane-strided loads this test XPASSES loudly in the report —
  the signal to re-run ``scripts/bench_fused_conv1.py`` stages l1/block
  and revisit docs/ROADMAP.md #5.

Run on hardware:
  PYTHONPATH=/root/.axon_site:/root/repo python -m pytest \
      tests/test_mosaic_probe.py -rxX --no-header
"""

import jax
import numpy as np
import pytest


def _toolchain() -> str:
    import jaxlib

    return f"jax {jax.__version__} / jaxlib {jaxlib.__version__}"


@pytest.mark.xfail(
    strict=False,
    reason="Mosaic lane-strided-load regression (docs/ROADMAP.md #5): "
    "fused_conv1 no longer compiles on the round-3 relay toolchain. "
    "An XPASS here means a new image FIXED it — re-run "
    "scripts/bench_fused_conv1.py stages l1/block.")
def test_mosaic_lane_strided_compile_probe():
    if jax.default_backend() != "tpu":
        pytest.skip(
            "hardware Mosaic compile probe needs a TPU (toolchain here: "
            f"{_toolchain()}); run on the chip to probe the lane-strided-"
            "load regression, then scripts/bench_fused_conv1.py on XPASS")
    from cut_detection_tpu.ops.pallas.fused_conv1 import fused_conv1_pool

    rng = np.random.default_rng(0)
    x = rng.integers(0, 256, size=(2, 27, 48, 3), dtype=np.uint8)
    k = rng.normal(0, 0.1, size=(3, 3, 3, 48)).astype(np.float32)
    bias = rng.normal(0, 0.1, 48).astype(np.float32)
    gamma = rng.normal(1, 0.1, 48).astype(np.float32)
    beta = rng.normal(0, 0.1, 48).astype(np.float32)
    mean = rng.normal(0, 0.5, 48).astype(np.float32)
    var = rng.uniform(0.5, 2, 48).astype(np.float32)
    out = fused_conv1_pool(x, k, bias, gamma, beta, mean, var)
    # Force the hardware compile + execution (through the relay only a
    # value fetch proves it).
    assert np.isfinite(np.asarray(out)).all()
