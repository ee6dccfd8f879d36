"""Layout metrics vs hand-computed values."""
import numpy as np

from layoutllm_t2i_tpu.eval.metrics import (
    compute_docsim, compute_iou, compute_maximum_iou,
)


def test_compute_iou_basic():
    b1 = np.array([[0.0, 0.0, 1.0, 1.0], [0.0, 0.0, 0.5, 0.5]])
    b2 = np.array([[0.0, 0.0, 0.5, 1.0], [0.5, 0.5, 1.0, 1.0]])
    iou = compute_iou(b1, b2)
    np.testing.assert_allclose(iou, [0.5, 0.0])


def test_max_iou_identical_layout():
    boxes = np.array([[0.1, 0.1, 0.5, 0.5], [0.6, 0.6, 0.9, 0.9]])
    labels = np.array([0, 1])
    out = compute_maximum_iou([(boxes, labels)], [(boxes, labels)])
    np.testing.assert_allclose(out, [1.0])


def test_max_iou_label_mismatch():
    boxes = np.array([[0.1, 0.1, 0.5, 0.5]])
    out = compute_maximum_iou([(boxes, np.array([0]))], [(boxes, np.array([1]))])
    np.testing.assert_allclose(out, [0.0])


def test_docsim_identical_is_positive_and_count_gated():
    boxes = np.array([[0.5, 0.5, 0.2, 0.2]])  # xcycwh for docsim
    labels = np.array([3])
    same = compute_docsim([(boxes, labels)], [(boxes, labels)])
    # identical boxes: weight = area^0.5 * 2^0 = sqrt(0.04) = 0.2
    np.testing.assert_allclose(same, [0.2])
    # box-count difference >= 3 -> 0
    many = (np.tile(boxes, (4, 1)), np.array([3, 3, 3, 3]))
    gated = compute_docsim([(boxes, labels)], [many])
    np.testing.assert_allclose(gated, [0.0])


def test_clip_score_math():
    from layoutllm_t2i_tpu.eval.clip_score import clip_score

    im = np.array([[1.0, 0.0], [0.0, 1.0]])
    tx = np.array([[1.0, 0.0], [-1.0, 0.0]])
    np.testing.assert_allclose(clip_score(im, tx), [2.5, 0.0])
