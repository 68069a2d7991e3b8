"""Golden parity: converted prod classifier vs the torch reference net.

SURVEY.md §7 gate 2: max |logit diff| well below 1e-4 on random inputs, and
argmax classes never flip.
"""

import numpy as np
import pytest

from tests.conftest import import_reference, reference_available

from cut_detection_tpu.models.assembly import load_default_net


@reference_available
def test_prod_net_logit_parity(torch, ref_net):
    tnet, tparams = ref_net
    net, params = load_default_net()
    assert params == tparams
    rng = np.random.default_rng(0)
    x = rng.random((16, 144, 256, 3), dtype=np.float32)
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(net(x))
    assert np.abs(ref - ours).max() < 1e-4
    np.testing.assert_array_equal(ref.argmax(1), ours.argmax(1))


@reference_available
def test_prod_net_param_count(ref_net):
    tnet, _ = ref_net
    net, _ = load_default_net()
    assert net.num_params() == sum(p.numel() for p in tnet.parameters())
    assert net.num_params() == 67971  # BASELINE.md prod classifier size


@reference_available
@pytest.mark.parametrize("shape", [(1, 144, 256, 3), (5, 72, 96, 3)])
def test_prod_net_other_shapes(torch, ref_net, shape):
    tnet, _ = ref_net
    net, _ = load_default_net()
    rng = np.random.default_rng(shape[0])
    x = rng.random(shape, dtype=np.float32)
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(net(x))
    assert np.abs(ref - ours).max() < 1e-4


@reference_available
def test_contrastive_config_roundtrip_through_torch(torch):
    """The contrastive defaults (32ch, avg_pool 1, 3-layer head,
    learn_contrasts.py:68-76 / net.py:77-79,146-152) through the same
    export-to-torch oracle."""
    import jax

    from cut_detection_tpu.config import ConvNetConfig, LinearNetConfig
    from cut_detection_tpu.checkpoint.convert import export_torch_state_dicts
    from cut_detection_tpu.models.frame_conv import (
        apply_frame_conv,
        apply_frame_linear,
        init_frame_conv,
        init_frame_linear,
    )

    conv_cfg = ConvNetConfig()          # 32ch, 3 layers, pool 1
    lin_cfg = LinearNetConfig()         # 3 layers, 32->32->8
    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    conv_p, conv_s = init_frame_conv(k1, conv_cfg)
    lin_p, lin_s = init_frame_linear(k2, lin_cfg)
    conv_sd, lin_sd = export_torch_state_dicts(
        {"conv": {"params": conv_p, "state": conv_s},
         "linear": {"params": lin_p, "state": lin_s}})

    net_mod = import_reference("frameID.net")
    tconv = net_mod.FrameConvNet()
    tconv.load_state_dict(conv_sd)
    tlin = net_mod.FrameLinearNet()
    tlin.load_state_dict(lin_sd)
    tconv.eval()
    tlin.eval()

    rng = np.random.default_rng(8)
    x = rng.random((3, 144, 256, 3), dtype=np.float32)
    with torch.no_grad():
        ref = tlin(tconv(torch.from_numpy(x.transpose(0, 3, 1, 2)))).numpy()
    feats, _ = apply_frame_conv(conv_p, conv_s, np.asarray(x), conv_cfg)
    ours, _ = apply_frame_linear(lin_p, lin_s, feats, lin_cfg)
    assert np.abs(ref - np.asarray(ours)).max() < 1e-4


@reference_available
def test_random_net_roundtrip_through_torch(torch):
    """Init a fresh JAX net, export to torch state dicts, load into the
    reference modules, and compare logits — exercises both conversion
    directions and non-default configs (contrastive-style net: pool size 1,
    3-layer head; frameID/net.py:77-79, 146-152 defaults)."""
    import jax

    from cut_detection_tpu.config import ConvNetConfig, LinearNetConfig
    from cut_detection_tpu.checkpoint.convert import export_torch_state_dicts
    from cut_detection_tpu.models.frame_conv import (
        apply_frame_conv,
        apply_frame_linear,
        init_frame_conv,
        init_frame_linear,
    )

    conv_cfg = ConvNetConfig(hidden_channels=16, n_conv_layers=2,
                             average_pool_size=2)
    lin_cfg = LinearNetConfig(n_layers=3, input_size=16 * 4, hidden_size=12,
                              output_size=5)
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    conv_p, conv_s = init_frame_conv(k1, conv_cfg)
    lin_p, lin_s = init_frame_linear(k2, lin_cfg)
    bundle = {"conv": {"params": conv_p, "state": conv_s},
              "linear": {"params": lin_p, "state": lin_s}}

    conv_sd, lin_sd = export_torch_state_dicts(bundle)
    net_mod = import_reference("frameID.net")
    tconv = net_mod.FrameConvNet(hidden_channels=16, n_conv_layers=2,
                                 average_pool_size=2)
    tconv.load_state_dict(conv_sd)
    tlin = net_mod.FrameLinearNet(n_layers=3, input_size=64, hidden_size=12,
                                  output_size=5)
    tlin.load_state_dict(lin_sd)
    tconv.eval()
    tlin.eval()

    rng = np.random.default_rng(1)
    x = rng.random((4, 45, 67, 3), dtype=np.float32)
    with torch.no_grad():
        ref = tlin(tconv(torch.from_numpy(x.transpose(0, 3, 1, 2)))).numpy()
    feats, _ = apply_frame_conv(conv_p, conv_s, np.asarray(x), conv_cfg)
    ours, _ = apply_frame_linear(lin_p, lin_s, feats, lin_cfg)
    assert np.abs(ref - np.asarray(ours)).max() < 1e-4


def test_glued_net_save_reload_roundtrip(tmp_path):
    """GluedNet.save -> load_bundle -> GluedNet reproduces logits bitwise
    (no reference needed: pure npz round trip of the prod bundle)."""
    from cut_detection_tpu.checkpoint.io import load_bundle
    from cut_detection_tpu.models.assembly import GluedNet

    net, params = load_default_net()
    path = str(tmp_path / "prod_copy.npz")
    net.save(path)
    net2 = GluedNet(load_bundle(path), net.model_params)
    assert net2.num_params() == net.num_params() == 67971

    rng = np.random.default_rng(7)
    x = rng.random((4, 144, 256, 3), dtype=np.float32)
    np.testing.assert_array_equal(np.asarray(net(x)), np.asarray(net2(x)))
