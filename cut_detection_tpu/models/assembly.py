"""Model assembly: glue conv backbone + linear head into one callable.

Mirrors ``load_and_glue_nets`` / ``load_default_net`` from
frameID/net.py:193-233, but the glued object is a jit-compiled pure
function over explicit pytrees instead of an ``nn.Sequential``.

Checkpoint sources supported:

- native ``.npz`` bundles (cut_detection_tpu/checkpoint/io.py)
- the reference's torch ``.pt`` state dicts (converted on the fly via
  cut_detection_tpu/checkpoint/convert.py)
"""

from __future__ import annotations

import functools
import logging
import os

import jax
import jax.numpy as jnp

logger = logging.getLogger(__name__)

from cut_detection_tpu.config import ConvNetConfig, LinearNetConfig, ModelParams
from cut_detection_tpu.checkpoint.io import load_bundle, save_bundle
from cut_detection_tpu.models.frame_conv import (
    apply_frame_conv,
    apply_frame_linear,
    num_params,
)

_PACKAGE_DIR = os.path.dirname(os.path.abspath(__file__))
_PROD_NET_DIR = os.path.join(os.path.dirname(_PACKAGE_DIR), "prod_net")
_REFERENCE_DIR = "/root/reference/frameID/prod_net"


class GluedNet:
    """Conv backbone + FC head with eval-mode apply (frameID/net.py:215).

    ``net(x)`` takes NHWC float32 frames in [0, 1] and returns [B, n_class]
    logits.  The apply function is jitted once per input shape; BN uses the
    checkpoint's running statistics (eval mode), matching ``net.eval()`` in
    segment_video.py:33.
    """

    def __init__(self, bundle, model_params: ModelParams,
                 precision: str = "float32"):
        self.bundle = jax.tree_util.tree_map(jnp.asarray, bundle)
        self.model_params = model_params
        self.precision = precision
        if precision in ("uint8_pool", "uint8_chain", "int8_mxu"):
            self._warn_if_stats_unconverged(bundle, precision)
        self.conv_cfg = model_params.conv_config()
        self.linear_cfg = model_params.linear_config()
        self._jitted = functools.partial(
            jax.jit(_glued_apply,
                    static_argnames=("conv_cfg", "linear_cfg",
                                     "compute_dtype")),
            conv_cfg=self.conv_cfg,
            linear_cfg=self.linear_cfg,
            compute_dtype=self.compute_dtype,
        )

    @staticmethod
    def _warn_if_stats_unconverged(bundle, precision: str) -> None:
        """The quantized rungs derive their activation scales from the
        BN running statistics; a checkpoint whose stats still sit at
        their init values (mean 0, var 1) would clip real activations
        hard.  Detectable at load time, so warn loudly rather than
        serve silently-wrong logits (docs/PERFORMANCE.md)."""
        import numpy as np

        for s in bundle["conv"]["state"]:
            if not s:
                continue
            mean = np.asarray(s.get("mean"))
            var = np.asarray(s.get("var"))
            if (np.abs(mean).max() < 1e-6
                    and np.abs(var - 1.0).max() < 1e-6):
                logger.warning(
                    "%s: a conv layer's BN running statistics "
                    "look uninitialized (mean=0, var=1).  The quantized "
                    "activation scale is derived from these stats, so "
                    "an untrained/unconverged checkpoint will clip "
                    "activations and degrade accuracy — use float32/"
                    "bfloat16_full for such models, or train until the "
                    "running stats converge.", precision)
                return

    @property
    def compute_dtype(self):
        """MXU/activation mode: None (full f32 at HIGHEST precision),
        'bfloat16' (bf16 operands, f32 activations) or 'bfloat16_full'
        (bf16 operands and activations — fastest)."""
        return None if self.precision == "float32" else self.precision

    def __repr__(self) -> str:
        mp = self.model_params
        return (f"GluedNet(conv={mp.conv_layers}x{mp.conv_channels}ch, "
                f"pool={mp.avg_pool_size}, "
                f"fc={mp.linear_layers}x{mp.linear_size}->"
                f"{mp.linear_output_size}, params={self.num_params():,}, "
                f"precision={self.precision})")

    def __call__(self, x):
        return self._jitted(self.bundle, x)

    def apply(self, x):
        return self(x)

    def num_params(self) -> int:
        return num_params(self.bundle["conv"]["params"]) + num_params(
            self.bundle["linear"]["params"]
        )

    def save(self, path: str) -> None:
        save_bundle(path, jax.tree_util.tree_map(lambda a: jax.device_get(a),
                                                 self.bundle))


def _glued_apply(bundle, x, *, conv_cfg: ConvNetConfig,
                 linear_cfg: LinearNetConfig, compute_dtype=None,
                 rings=None):
    # NOTE: the space-to-depth fused frontend (ops/fused_frontend.py) is
    # deliberately NOT wired in: measured 27x SLOWER on TPU — the stride-3
    # patch gathers cost far more in relayout than the matmul utilization
    # win (docs/PERFORMANCE.md).  XLA's native conv lowering wins.
    feats, _ = apply_frame_conv(bundle["conv"]["params"],
                                bundle["conv"]["state"], x, conv_cfg,
                                train=False, compute_dtype=compute_dtype,
                                rings=rings)
    logits, _ = apply_frame_linear(bundle["linear"]["params"],
                                   bundle["linear"]["state"], feats,
                                   linear_cfg, train=False,
                                   compute_dtype=compute_dtype)
    return logits


def fold_preprocess(bundle):
    """Fold the BGR->RGB flip and /255 normalize into conv layer 1.

    ``conv(flip(x) / 255, W) == conv(x, W[:, :, ::-1, :] / 255)`` — with
    the fold, raw uint8 BGR pixels (cast to float) feed the conv directly
    and the whole preprocess pass disappears (measured +14% at bf16_full,
    +17% at float32; docs/PERFORMANCE.md).  The /255-scaled weights round
    differently at the ulp level, but folded float32 logits still match
    the torch reference to <4e-6 on hardware, so every pipeline mode
    folds (only the Pallas-preprocess path keeps the explicit normalize).
    """
    layer0 = dict(bundle["conv"]["params"][0])
    layer0["kernel"] = layer0["kernel"][:, :, ::-1, :] / 255.0
    conv_params = [layer0] + list(bundle["conv"]["params"][1:])
    return {
        "conv": {"params": conv_params, "state": bundle["conv"]["state"]},
        "linear": bundle["linear"],
    }


def folded_input(frames_u8, compute_dtype):
    """Input for a ``fold_preprocess``'d bundle, per precision rung.

    ``int8_mxu`` consumes the raw uint8 frames directly (layer 1 runs
    int8 with the -128 shift folded into its constant term); every other
    mode feeds the folded conv dense float32.  The single home for this
    dispatch — bench.py and pipeline.make_classify_step share it.
    """
    if str(compute_dtype) == "int8_mxu":
        return frames_u8
    return frames_u8.astype(jnp.float32)


def precompute_rings(bundle, conv_cfg: ConvNetConfig, h: int, w: int,
                     compute_dtype, *, fold: bool = True):
    """Per-layer ring constants of the deferred-affine rungs, eagerly.

    The uint8_chain/int8_mxu blocks add an input-independent constant
    term ``conv(b·1, W) + bias`` per mid-stack layer (layers.py).  Inside
    a device-resident loop XLA hoists it (loop-invariant), but real
    per-batch step CALLS pay it every time — and on TPU even a tiny conv
    costs ~0.4 ms (a small-conv latency floor, ~28% of the whole classify
    step; scripts/probe_ring_cost.py).  Since the term depends only on
    the bundle and the input shape, per-call paths (pipeline.make_classify_step,
    bench.py) compute it HERE once per (net, shape) and pass it into the
    jitted step as a resident tensor.

    Replicates the blocks' affine chain exactly via the shared
    ``u8_pending_affine`` / ``i8_pending_affine`` helpers, so the values
    are bit-identical to the in-graph computation (golden-CSV-gated).
    ``fold=True`` mirrors the folded-preprocess graph (the only caller
    shape); int8_mxu's layer 1 then consumes raw uint8 frames and has a
    ring of its own.  Returns a tuple (None entries where the layer has
    no ring), or None when ``compute_dtype`` has no rings at all.
    """
    cd = str(compute_dtype)
    if cd not in ("uint8_chain", "int8_mxu"):
        return None
    from cut_detection_tpu.models.layers import (
        POOL_WINDOW,
        const_conv_ring,
        i8_pending_affine,
        u8_pending_affine,
    )

    if len(bundle["conv"]["params"]) != conv_cfg.n_conv_layers:
        raise ValueError(
            f"bundle has {len(bundle['conv']['params'])} conv layers but "
            f"conv_cfg.n_conv_layers={conv_cfg.n_conv_layers} — the ring "
            "shape walk below would desync from the graph")

    if fold:
        bundle = fold_preprocess(bundle)
    params = bundle["conv"]["params"]
    state = bundle["conv"]["state"]
    if not all("gamma" in p for p in params):
        return None  # apply_frame_conv falls back to the dense path
    int8 = cd == "int8_mxu"
    pend = i8_pending_affine if int8 else u8_pending_affine
    rings, affine = [], None
    hh, ww = h, w
    for p, s in zip(params, state):
        p = {k: jnp.asarray(v) for k, v in p.items()}
        s = {k: jnp.asarray(v) for k, v in s.items()}
        kernel = p["kernel"].astype(jnp.float32) if int8 else p["kernel"]
        if affine is None:
            if int8 and fold:
                # Folded layer 1 consumes raw uint8 as int8 + constant
                # 128 (apply_conv_block_i8's affine=None branch).
                b = jnp.full((kernel.shape[2],), 128.0, jnp.float32)
                rings.append(const_conv_ring(b, kernel, p["bias"], hh, ww))
            else:
                rings.append(None)  # dense float input, no ring
        else:
            _, b = affine
            rings.append(const_conv_ring(b, kernel, p["bias"], hh, ww))
        affine = pend(p, s)
        # Stride = layers.POOL_WINDOW (the blocks' default), floor — the
        # one shared constant keeps ring shapes synced with the graph.
        hh, ww = hh // POOL_WINDOW, ww // POOL_WINDOW
    return tuple(rings)


def load_and_glue_nets(param_file: str, conv_file: str, linear_file: str,
                       precision: str = "float32"):
    """Load a checkpoint triplet and return ``(net, model_params_dict)``.

    Drop-in analog of frameID/net.py:193-217: the return is a callable net
    plus the params dict.  ``.pt`` files are converted from torch format;
    ``.npz`` files load natively.  ``precision="bfloat16"`` runs the
    conv/matmul operands in bf16 on the MXU (float32 accumulation).
    """
    if conv_file.endswith(".pt") or linear_file.endswith(".pt"):
        from cut_detection_tpu.checkpoint.convert import convert_torch_checkpoint

        bundle, model_params = convert_torch_checkpoint(
            param_file, conv_file, linear_file
        )
    else:
        model_params = ModelParams.from_json(param_file)
        conv = load_bundle(conv_file)
        lin = load_bundle(linear_file)
        bundle = {"conv": conv, "linear": lin}
    net = GluedNet(bundle, model_params, precision=precision)
    return net, model_params.to_dict()


def load_triplet_or_default(model_dir: str | None = None,
                            model_name: str = "init_model",
                            precision: str = "float32"):
    """Load a saved triplet from ``model_dir`` (npz preferred, torch .pt
    accepted), or the bundled prod classifier when no dir is given."""
    if not model_dir:
        return load_default_net(precision=precision)

    def pick(suffix: str, alt: str) -> str:
        path = os.path.join(model_dir, f"{model_name}{suffix}")
        return path if os.path.isfile(path) else os.path.join(
            model_dir, f"{model_name}{alt}")

    return load_and_glue_nets(
        os.path.join(model_dir, f"{model_name}_model_params.json"),
        pick("_classifier_conv.npz", "_classifier_conv.pt"),
        pick("_classifier_linear.npz", "_classifier_linear.pt"),
        precision=precision,
    )


def load_embedding_net(model_dir: str, model_name: str = "init_model",
                       precision: str = "float32"):
    """Load a contrastive (conv + projection head) pair for batched
    embedding inference — BASELINE.md config #3.

    Reads the ``{name}_conv.npz`` / ``{name}_linear.npz`` pair written by
    cli/train_contrastive.py with its ``{name}_embed_params.json``
    sidecar.  Returns ``(net, params_dict)``; ``net(x)`` maps NHWC float
    frames to projection-space embeddings.
    """
    params_file = os.path.join(model_dir, f"{model_name}_embed_params.json")
    model_params = ModelParams.from_json(params_file)
    conv = load_bundle(os.path.join(model_dir, f"{model_name}_conv.npz"))
    linear = load_bundle(os.path.join(model_dir, f"{model_name}_linear.npz"))
    net = GluedNet({"conv": conv, "linear": linear}, model_params,
                   precision=precision)
    return net, model_params.to_dict()


def load_default_net(precision: str = "float32"):
    """Load the bundled prod classifier (frameID/net.py:221-233 analog).

    Prefers the converted native bundle shipped in
    ``cut_detection_tpu/prod_net``; falls back to converting the reference's
    torch checkpoint in place if only that is available.
    """
    params_file = os.path.join(_PROD_NET_DIR, "init_model_model_params.json")
    native = os.path.join(_PROD_NET_DIR, "init_model.npz")
    if os.path.isfile(native):
        model_params = ModelParams.from_json(params_file)
        bundle = load_bundle(native)
        net = GluedNet(bundle, model_params, precision=precision)
        return net, model_params.to_dict()
    # Fallback: convert the reference checkpoint directly.
    return load_and_glue_nets(
        os.path.join(_REFERENCE_DIR, "init_model_model_params.json"),
        os.path.join(_REFERENCE_DIR, "init_model_classifier_conv.pt"),
        os.path.join(_REFERENCE_DIR, "init_model_classifier_linear.pt"),
        precision=precision,
    )
