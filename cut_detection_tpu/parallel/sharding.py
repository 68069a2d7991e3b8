"""Sharding specs and sharded execution steps.

Design (SURVEY.md §2.3 "first-class components the TPU build adds"):

- **Inference**: frames shard over the ``data`` axis; params replicate.
  One jit'd call per global batch; XLA partitions the conv stack with zero
  communication (per-frame work is independent) — the only collective is
  the implicit gather when the host fetches the per-frame outputs.
- **Training**: batch shards over ``data``; gradients are globally reduced
  by XLA (GSPMD inserts the psum over ICI).  Batch-norm statistics are
  computed over the *global* batch (sync-BN semantics — torch DDP would
  use per-replica stats; global stats are a deliberate improvement and
  exact for the jit-as-one-program formulation).
- **Tensor parallel** (optional ``model`` axis): hidden channels of the
  conv stack and FC hidden units shard over ``model``.  For the 68K-param
  prod net this is demonstrative, but the specs generalize to wider
  backbones unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (frame/batch) sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(mesh: Mesh, batch):
    """Place a host batch (leading dim divisible by data-axis size)."""
    return jax.device_put(batch, batch_sharding(mesh))


def _conv_param_spec(p: dict) -> dict:
    spec = {"kernel": P(None, None, None, "model"), "bias": P("model")}
    if "gamma" in p:
        spec["gamma"] = P("model")
        spec["beta"] = P("model")
    return spec


def _conv_state_spec(s: dict) -> dict:
    return {"mean": P("model"), "var": P("model")} if s else {}


def model_param_specs(bundle) -> dict:
    """PartitionSpec tree for tensor-parallel channel sharding.

    Conv kernels shard the output-channel (O of HWIO) dim; per-channel BN
    vectors follow.  FC layers shard the output features except the final
    (tiny, 3-way) layer, which replicates.  XLA inserts the needed
    gathers/reduce-scatters where a sharded output feeds the next layer's
    sharded input.
    """
    conv_p = [_conv_param_spec(p) for p in bundle["conv"]["params"]]
    conv_s = [_conv_state_spec(s) for s in bundle["conv"]["state"]]
    n_lin = len(bundle["linear"]["params"])
    lin_p, lin_s = [], []
    for i, (p, s) in enumerate(zip(bundle["linear"]["params"],
                                   bundle["linear"]["state"])):
        final = i == n_lin - 1
        spec = {
            "kernel": P(None, None) if final else P(None, "model"),
            "bias": P() if final else P("model"),
        }
        if "gamma" in p:
            spec["gamma"] = P("model")
            spec["beta"] = P("model")
        lin_p.append(spec)
        lin_s.append({"mean": P("model"), "var": P("model")} if s else {})
    return {
        "conv": {"params": conv_p, "state": conv_s},
        "linear": {"params": lin_p, "state": lin_s},
    }


def shard_bundle(mesh: Mesh, bundle, *, tensor_parallel: bool = False):
    """Place a model bundle on the mesh (replicated or channel-sharded)."""
    if not tensor_parallel:
        return replicate(mesh, bundle)
    specs = model_param_specs(bundle)
    return jax.tree_util.tree_map(
        lambda arr, spec: jax.device_put(arr, NamedSharding(mesh, spec)),
        bundle, specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def make_sharded_classify_step(net, mesh: Mesh, *, tensor_parallel: bool = False):
    """Sharded inference: uint8 NHWC batch -> (conf, pred), data-parallel.

    The returned callable takes (bundle, frames_u8) where frames' leading
    dim is divisible by the data-axis size.  With ``tensor_parallel`` the
    bundle is expected channel-sharded over the ``model`` axis (see
    ``shard_bundle``).  Outputs keep the batch sharding; fetch with
    ``jax.device_get`` (one gather to host).
    """
    from cut_detection_tpu.models.assembly import _glued_apply, precompute_rings
    from cut_detection_tpu.ops.preprocess import normalize_frames

    if tensor_parallel:
        specs = model_param_specs(net.bundle)
        bundle_sharding = jax.tree_util.tree_map(
            lambda spec: NamedSharding(mesh, spec), specs,
            is_leaf=lambda x: isinstance(x, P),
        )
    else:
        bundle_sharding = NamedSharding(mesh, P())
    in_shardings = (bundle_sharding, batch_sharding(mesh),
                    NamedSharding(mesh, P()))
    out_shardings = (batch_sharding(mesh), batch_sharding(mesh))

    def _step(bundle, frames_u8, rings):
        from cut_detection_tpu.segmentation.rle import device_frame_scores

        x = normalize_frames(frames_u8)
        logits = _glued_apply(bundle, x, conv_cfg=net.conv_cfg,
                              linear_cfg=net.linear_cfg,
                              compute_dtype=net.compute_dtype, rings=rings)
        # One source of truth for the per-frame reduction (its
        # torch-matching tie-break contract lives in rle.py).
        return device_frame_scores(logits)

    jitted = jax.jit(_step, in_shardings=in_shardings,
                     out_shardings=out_shardings)

    if str(net.compute_dtype) not in ("uint8_chain", "int8_mxu"):
        return lambda bundle, frames_u8: jitted(bundle, frames_u8, None)

    # Deferred-affine rungs: the ring constants are input-independent
    # but cost a ~0.4 ms small-conv latency floor per CALL if computed
    # in-graph (assembly.precompute_rings) — precompute per shape and
    # pass them in replicated.  fold=False mirrors this step's
    # normalize_frames graph (dense float layer 1, mid-stack rings).
    src_bundle, conv_cfg, compute_dtype = net.bundle, net.conv_cfg, net.compute_dtype
    ring_cache: dict = {}

    def step(bundle, frames_u8):
        hw = tuple(frames_u8.shape[1:3])
        rings = ring_cache.get(hw)
        if rings is None:
            rings = precompute_rings(src_bundle, conv_cfg, hw[0], hw[1],
                                     compute_dtype, fold=False)
            ring_cache[hw] = rings
        return jitted(bundle, frames_u8, rings)

    return step
