"""Loss golden tests vs torch / the reference's ContrastiveLoss."""

import numpy as np
import pytest

from tests.conftest import import_reference, reference_available

from cut_detection_tpu.train.losses import cross_entropy_sum, ntxent_loss


def test_cross_entropy_sum_matches_torch(torch):
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((32, 3)).astype(np.float32)
    labels = rng.integers(0, 3, size=32)
    ours = float(cross_entropy_sum(logits, labels))
    ref = torch.nn.CrossEntropyLoss(reduction="sum")(
        torch.from_numpy(logits), torch.from_numpy(labels)
    ).item()
    assert abs(ours - ref) < 1e-3


@reference_available
@pytest.mark.parametrize("h_norm", [True, False])
def test_ntxent_matches_reference(torch, h_norm):
    metrics = import_reference("frameID.metrics")
    rng = np.random.default_rng(1)
    x = rng.standard_normal((64, 16)).astype(np.float32)
    crit = metrics.ContrastiveLoss(batch_size=32, h_norm=h_norm)
    ref_loss, ref_logits, ref_labels = crit(torch.from_numpy(x))
    loss, logits_ab, labels = ntxent_loss(x, temperature=1.0, h_norm=h_norm)
    assert abs(float(loss) - ref_loss.item()) < 1e-4
    np.testing.assert_allclose(np.asarray(logits_ab), ref_logits.numpy(),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(labels), ref_labels.numpy())


@reference_available
def test_contrastive_loss_class_facade(torch):
    from cut_detection_tpu.train.losses import ContrastiveLoss

    metrics = import_reference("frameID.metrics")
    rng = np.random.default_rng(3)
    x = rng.standard_normal((32, 16)).astype(np.float32)
    ref_loss, _, _ = metrics.ContrastiveLoss(batch_size=16)(
        torch.from_numpy(x))
    loss, logits, labels = ContrastiveLoss(batch_size=16)(x)
    assert abs(float(loss) - ref_loss.item()) < 1e-4
    with pytest.raises(ValueError):
        ContrastiveLoss(batch_size=8)(x)


@reference_available
def test_ntxent_temperature(torch):
    metrics = import_reference("frameID.metrics")
    rng = np.random.default_rng(2)
    x = rng.standard_normal((16, 8)).astype(np.float32)
    crit = metrics.ContrastiveLoss(batch_size=8, temperature=0.5)
    ref_loss, _, _ = crit(torch.from_numpy(x))
    loss, _, _ = ntxent_loss(x, temperature=0.5)
    assert abs(float(loss) - ref_loss.item()) < 1e-4
