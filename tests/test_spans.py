"""Unit tests for span math — the reference's doctest values become real tests.

Golden values from music_detr/span_utils.py doctests (:48-54, :99-103) and
hand-derived cases for the clamped eval IoU (:119-170).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mgsv_tpu.ops import spans


def test_cw_se_roundtrip():
    cw = jnp.array([[0.5, 0.2], [0.3, 0.6], [0.0, 0.0]])
    se = spans.span_cw_to_se(cw)
    np.testing.assert_allclose(se, [[0.4, 0.6], [0.0, 0.6], [0.0, 0.0]], atol=1e-7)
    np.testing.assert_allclose(spans.span_se_to_cw(se), cw, atol=1e-7)


def test_cw_se_batched_leading_dims():
    cw = jnp.ones((3, 4, 5, 2)) * 0.5
    assert spans.span_cw_to_se(cw).shape == (3, 4, 5, 2)


def test_temporal_iou_golden():
    # span_utils.py:48-54 doctest
    s1 = jnp.array([[0, 0.2], [0.5, 1.0]])
    s2 = jnp.array([[0, 0.3], [0.0, 1.0]])
    iou, union = spans.temporal_iou(s1, s2)
    np.testing.assert_allclose(iou, [[0.6667, 0.2], [0.0, 0.5]], atol=1e-4)
    np.testing.assert_allclose(union, [[0.3, 1.0], [0.8, 1.0]], atol=1e-6)


def test_generalized_temporal_iou_golden():
    # span_utils.py:99-103 doctest
    s1 = jnp.array([[0, 0.2], [0.5, 1.0]])
    s2 = jnp.array([[0, 0.3], [0.0, 1.0]])
    giou = spans.generalized_temporal_iou(s1, s2)
    np.testing.assert_allclose(giou, [[0.6667, 0.2], [-0.2, 0.5]], atol=1e-4)


def test_elementwise_giou_matches_pairwise_diag():
    rng = np.random.RandomState(0)
    c = rng.rand(16, 1)
    w = rng.rand(16, 1) * 0.5
    a = np.concatenate([c - w / 2, c + w / 2], -1)
    c2 = rng.rand(16, 1)
    w2 = rng.rand(16, 1) * 0.5
    b = np.concatenate([c2 - w2 / 2, c2 + w2 / 2], -1)
    pairwise = spans.generalized_temporal_iou(jnp.asarray(a), jnp.asarray(b))
    elementwise = spans.elementwise_temporal_giou(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(np.diag(pairwise), elementwise, atol=1e-6)


def test_individual_iou_matches_reference_semantics():
    # perfect overlap
    assert spans.individual_iou(10.0, 20.0, 100.0, 10.0, 20.0) == pytest.approx(1.0)
    # degenerate gt
    assert spans.individual_iou(20.0, 10.0, 100.0, 10.0, 20.0) == pytest.approx(0.0)
    # pred clamped to [0, m_duration]: pred (-5, 150) on m_duration=100
    # -> pred (0, 100), gt (0, 50) -> inter 50, union 100
    assert spans.individual_iou(0.0, 50.0, 100.0, -5.0, 150.0) == pytest.approx(0.5)
    # disjoint
    assert spans.individual_iou(0.0, 10.0, 100.0, 50.0, 60.0) == pytest.approx(0.0)
    # discounted: exact overlap keeps alpha = 1
    assert spans.individual_iou(10.0, 20.0, 100.0, 10.0, 20.0, discounted=True) == pytest.approx(1.0)


def test_eval_iou_batch_clamps_to_max_duration():
    gt = jnp.array([[100.0, 200.0], [0.0, 30.0]])
    m_dur = jnp.array([220.0, 35.0])
    pred = jnp.array([[90.0, 500.0], [-3.0, 30.0]])
    # sample0: pred clamped (90, 240) then (90, 220); inter (100,200)=100;
    # union 130 + 100 - 100 = 130
    # sample1: pred clamped (0, 30); iou = 1
    iou = spans.eval_iou_batch(gt, m_dur, pred, max_m_duration=240.0)
    np.testing.assert_allclose(iou, [100.0 / 130.0, 1.0], atol=1e-6)


def test_get_cw_proportion():
    gt = jnp.array([[60.0, 300.0]])  # end clamped to 240
    cw = spans.get_cw_proportion(gt, 240.0)
    np.testing.assert_allclose(cw, [[(60 + 240) / 2 / 240, (240 - 60) / 240]], atol=1e-6)


def test_zero_width_spans_do_not_nan():
    z = jnp.zeros((4, 2))
    iou, _ = spans.temporal_iou(z, z)
    assert not np.any(np.isnan(iou))
    assert not np.any(np.isnan(spans.generalized_temporal_iou(z, z)))
