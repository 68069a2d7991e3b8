"""Utility-layer tests (cache, platform, profiling, logging)."""

import os
import time

from cut_detection_tpu.utils.profiling import ThroughputMeter, maybe_trace


def test_throughput_meter_rates():
    m = ThroughputMeter(warmup_items=10)
    m.start()
    m.update(10)       # warmup
    time.sleep(0.05)
    m.update(50)
    assert m.total_items == 60
    assert m.rate > 0
    assert m.steady_rate > 0


def test_maybe_trace_noop():
    with maybe_trace(None):
        pass  # must not require jax at all


def test_maybe_trace_writes(tmp_path):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    with maybe_trace(str(tmp_path)):
        float(jnp.ones(3).sum())
    assert os.path.isdir(tmp_path / "plugins")


def test_compilation_cache_env_opt_out(monkeypatch, tmp_path):
    from cut_detection_tpu.utils import cache

    monkeypatch.setenv("CUTDET_NO_COMPILE_CACHE", "1")
    assert cache.enable_compilation_cache() is None
    monkeypatch.delenv("CUTDET_NO_COMPILE_CACHE")
    monkeypatch.setenv("CUTDET_COMPILE_CACHE_DIR", str(tmp_path / "xc"))
    assert cache.enable_compilation_cache() == str(tmp_path / "xc")
    assert os.path.isdir(tmp_path / "xc")


def test_force_cpu():
    from cut_detection_tpu.utils.platform import force_cpu

    force_cpu()
    import jax

    assert os.environ["JAX_PLATFORMS"] == "cpu"
    assert jax.devices()[0].platform == "cpu"
