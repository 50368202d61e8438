"""Metric and loss golden tests.

CE is golden-tested against torch.nn.CrossEntropyLoss (torch-cpu is in the
image). Metrics are tested against a hand-written numpy oracle implementing
torchmetrics' documented micro-average + ignore_index semantics
(the reference's metric stack, water_seg_model.py:46-63)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from floodplanet_code_tpu.ops.losses import (
    cross_entropy_ignore,
    dice_loss,
    weighted_cross_entropy,
)
from floodplanet_code_tpu.ops.metrics import (
    compute_binary_class_metrics,
    compute_metrics,
    confusion_from_logits,
    confusion_from_preds,
    torchmetrics_key_names,
)

pytestmark = pytest.mark.smoke  # sub-minute tier: pure functions, no jit-heavy fits


def oracle_confusion(preds, target, n_classes, ignore_index=None):
    valid = np.ones(target.shape, bool)
    if ignore_index is not None:
        valid &= target != ignore_index
    cm = np.zeros((n_classes, n_classes))
    for t, p in zip(target[valid].ravel(), preds[valid].ravel()):
        cm[t, p] += 1
    return cm


def oracle_micro(preds, target, n_classes, ignore_index=None):
    """torchmetrics micro semantics (see ops/metrics.py docstring)."""
    cm = oracle_confusion(preds, target, n_classes, ignore_index)
    correct, total = np.trace(cm), cm.sum()
    acc = correct / total if total else 0.0
    num = np.diag(cm).copy()
    denom = cm.sum(0) + cm.sum(1) - num
    if ignore_index is not None and 0 <= ignore_index < n_classes:
        num[ignore_index] = 0
        denom[ignore_index] = 0
    iou = num.sum() / denom.sum() if denom.sum() else 0.0
    return acc, iou


class TestConfusion:
    def test_matches_oracle(self, rng):
        t = rng.integers(0, 3, (4, 16, 16)).astype(np.int32)
        p = rng.integers(0, 3, (4, 16, 16)).astype(np.int32)
        for ignore in (None, 0, 2):
            got = np.asarray(
                confusion_from_preds(jnp.asarray(p), jnp.asarray(t), 3, ignore)
            )
            np.testing.assert_allclose(got, oracle_confusion(p, t, 3, ignore))

    def test_negative_ignore_sentinel(self, rng):
        t = rng.integers(-1, 3, (512,)).astype(np.int32)
        p = rng.integers(0, 3, (512,)).astype(np.int32)
        got = np.asarray(confusion_from_preds(jnp.asarray(p), jnp.asarray(t), 3, -1))
        np.testing.assert_allclose(got, oracle_confusion(p, t, 3, -1))

    def test_sentinel_ignored_even_with_resolved_ignore_index(self, rng):
        """ignore_index=-1 configs resolve to n_classes-1 for loss/metrics
        while the dataset keeps the raw -1 sentinel in targets; those pixels
        must be dropped, not clipped into class 0 (ADVICE r1)."""
        from floodplanet_code_tpu.ops.losses import cross_entropy_ignore

        t = rng.integers(-1, 2, (512,)).astype(np.int32)  # {-1, 0, 1}
        p = rng.integers(0, 3, (512,)).astype(np.int32)
        resolved = 2  # resolve_ignore_index(-1, n_classes=3)
        got = np.asarray(confusion_from_preds(jnp.asarray(p), jnp.asarray(t), 3, resolved))
        # Oracle: only pixels with t in {0, 1} count.
        keep = t >= 0
        np.testing.assert_allclose(got, oracle_confusion(p[keep], t[keep], 3))
        # Loss likewise excludes the sentinel pixels entirely.
        logits = rng.standard_normal((512, 3)).astype(np.float32)
        loss_all = float(
            cross_entropy_ignore(jnp.asarray(logits), jnp.asarray(t), resolved)
        )
        loss_kept = float(
            cross_entropy_ignore(
                jnp.asarray(logits[keep]), jnp.asarray(t[keep]), resolved
            )
        )
        np.testing.assert_allclose(loss_all, loss_kept, rtol=1e-6)

    def test_sample_weight_mask(self, rng):
        t = rng.integers(0, 3, (4, 8, 8)).astype(np.int32)
        p = rng.integers(0, 3, (4, 8, 8)).astype(np.int32)
        w = np.array([1, 1, 0, 0], np.float32)[:, None, None]
        got = np.asarray(
            confusion_from_preds(
                jnp.asarray(p), jnp.asarray(t), 3, None, jnp.asarray(w)
            )
        )
        np.testing.assert_allclose(got, oracle_confusion(p[:2], t[:2], 3))

    def test_from_logits(self, rng):
        logits = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
        t = rng.integers(0, 3, (2, 8, 8)).astype(np.int32)
        got = np.asarray(confusion_from_logits(jnp.asarray(logits), jnp.asarray(t)))
        np.testing.assert_allclose(
            got, oracle_confusion(logits.argmax(-1), t, 3)
        )


class TestMicroMetrics:
    @pytest.mark.parametrize("ignore", [None, 0, 2])
    def test_matches_oracle(self, rng, ignore):
        t = rng.integers(0, 3, (10000,)).astype(np.int32)
        p = rng.integers(0, 3, (10000,)).astype(np.int32)
        cm = confusion_from_preds(jnp.asarray(p), jnp.asarray(t), 3, ignore)
        metrics = compute_metrics(cm, prefix="val_", ignore_index=ignore)
        acc, iou = oracle_micro(p, t, 3, ignore)
        assert float(metrics["val_Accuracy"]) == pytest.approx(acc, abs=1e-6)
        assert float(metrics["val_F1Score"]) == pytest.approx(acc, abs=1e-6)
        assert float(metrics["val_JaccardIndex"]) == pytest.approx(iou, abs=1e-6)

    def test_all_ignored_is_zero_not_nan(self):
        t = np.full((64,), 0, np.int32)
        p = np.zeros((64,), np.int32)
        cm = confusion_from_preds(jnp.asarray(p), jnp.asarray(t), 3, 0)
        metrics = compute_metrics(cm, ignore_index=0)
        for v in metrics.values():
            assert float(v) == 0.0

    def test_perfect_prediction(self, rng):
        t = rng.integers(0, 3, (1000,)).astype(np.int32)
        cm = confusion_from_preds(jnp.asarray(t), jnp.asarray(t), 3, None)
        metrics = compute_metrics(cm)
        assert float(metrics["JaccardIndex"]) == pytest.approx(1.0)

    def test_additivity_across_batches(self, rng):
        # CM accumulation across steps must equal one big evaluation.
        t = rng.integers(0, 3, (2, 500)).astype(np.int32)
        p = rng.integers(0, 3, (2, 500)).astype(np.int32)
        cm = confusion_from_preds(
            jnp.asarray(p[0]), jnp.asarray(t[0]), 3, 0
        ) + confusion_from_preds(jnp.asarray(p[1]), jnp.asarray(t[1]), 3, 0)
        acc, iou = oracle_micro(p.ravel(), t.ravel(), 3, 0)
        metrics = compute_metrics(cm, ignore_index=0)
        assert float(metrics["JaccardIndex"]) == pytest.approx(iou, abs=1e-6)

    def test_water_class_metrics(self):
        cm = jnp.asarray(np.array([[50, 10, 0], [5, 30, 0], [0, 0, 0]], np.float32))
        m = compute_binary_class_metrics(cm, positive_class=1)
        assert float(m["water_precision"]) == pytest.approx(30 / 40)
        assert float(m["water_recall"]) == pytest.approx(30 / 35)
        assert float(m["water_IoU"]) == pytest.approx(30 / 45)

    def test_key_mapping(self):
        mapping = torchmetrics_key_names("val_")
        assert mapping["val_JaccardIndex"] == "val_MulticlassJaccardIndex"


class TestCrossEntropy:
    @pytest.mark.parametrize("ignore", [None, 0, 2, -1])
    def test_matches_torch(self, rng, ignore):
        logits = rng.standard_normal((4, 8, 8, 3)).astype(np.float32)
        low = -1 if ignore == -1 else 0
        t = rng.integers(low, 3, (4, 8, 8)).astype(np.int64)
        ours = float(
            cross_entropy_ignore(
                jnp.asarray(logits), jnp.asarray(t.astype(np.int32)), ignore
            )
        )
        torch_loss = torch.nn.CrossEntropyLoss(
            ignore_index=ignore if ignore is not None else -100
        )
        # torch wants NCHW logits
        theirs = float(
            torch_loss(
                torch.tensor(logits).permute(0, 3, 1, 2), torch.tensor(t)
            )
        )
        assert ours == pytest.approx(theirs, rel=1e-5)

    def test_all_ignored_returns_zero(self):
        logits = np.zeros((2, 4, 4, 3), np.float32)
        t = np.zeros((2, 4, 4), np.int32)
        loss = cross_entropy_ignore(jnp.asarray(logits), jnp.asarray(t), 0)
        assert float(loss) == 0.0

    def test_weighted_matches_torch(self, rng):
        logits = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
        t = rng.integers(0, 3, (2, 8, 8)).astype(np.int64)
        weights = np.array([0.2, 1.0, 2.0], np.float32)
        ours = float(
            weighted_cross_entropy(
                jnp.asarray(logits),
                jnp.asarray(t.astype(np.int32)),
                jnp.asarray(weights),
                ignore_index=0,
            )
        )
        torch_loss = torch.nn.CrossEntropyLoss(
            weight=torch.tensor(weights), ignore_index=0
        )
        theirs = float(
            torch_loss(torch.tensor(logits).permute(0, 3, 1, 2), torch.tensor(t))
        )
        assert ours == pytest.approx(theirs, rel=1e-5)

    def test_gradients_finite(self, rng):
        import jax

        logits = jnp.asarray(rng.standard_normal((2, 4, 4, 3)).astype(np.float32))
        t = jnp.asarray(rng.integers(0, 3, (2, 4, 4)).astype(np.int32))
        grad = jax.grad(lambda l: cross_entropy_ignore(l, t, 0))(logits)
        assert np.isfinite(np.asarray(grad)).all()
        # Ignored pixels contribute zero gradient.
        mask = np.asarray(t) == 0
        np.testing.assert_allclose(np.asarray(grad)[mask], 0.0, atol=1e-7)


class TestDice:
    def test_perfect_prediction_near_zero(self, rng):
        t = rng.integers(0, 2, (2, 8, 8)).astype(np.int32)
        logits = (np.eye(3)[t] * 100).astype(np.float32)
        loss = float(dice_loss(jnp.asarray(logits), jnp.asarray(t)))
        assert loss < 0.35  # class 2 never present -> its dice term is 1

    def test_range(self, rng):
        logits = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
        t = rng.integers(0, 3, (2, 8, 8)).astype(np.int32)
        loss = float(dice_loss(jnp.asarray(logits), jnp.asarray(t)))
        assert 0.0 <= loss <= 1.0
