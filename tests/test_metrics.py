import numpy as np
import pytest

from satellite_computervision_tpu.models import metrics


def test_confusion_matrix_counts():
    t = np.array([0, 0, 1, 1, 2])
    p = np.array([0, 1, 1, 1, 0])
    cm = np.asarray(metrics.confusion_matrix(t, p, 3))
    want = np.array([[1, 1, 0], [0, 2, 0], [1, 0, 0]], np.float32)
    np.testing.assert_array_equal(cm, want)


def test_normalize_confusion_matrix():
    cm = np.array([[2.0, 2.0], [0.0, 4.0]])
    got = np.asarray(metrics.normalize_confusion_matrix(cm))
    np.testing.assert_allclose(got, [[0.5, 0.5], [0.0, 1.0]])


def test_mean_iou_binary():
    t = np.array([0, 0, 1, 1])
    p = np.array([0, 1, 1, 1])
    cm = metrics.confusion_matrix(t, p, 2)
    # class0: tp=1 fp=0 fn=1 -> 0.5 ; class1: tp=2 fp=1 fn=0 -> 2/3
    np.testing.assert_allclose(float(metrics.mean_iou_from_cm(cm)), (0.5 + 2 / 3) / 2, rtol=1e-6)
    np.testing.assert_allclose(float(metrics.accuracy_from_cm(cm)), 0.75, rtol=1e-6)


def test_mean_iou_ignores_absent_classes():
    t = np.array([0, 0, 0])
    p = np.array([0, 0, 0])
    cm = metrics.confusion_matrix(t, p, 5)
    assert float(metrics.mean_iou_from_cm(cm)) == pytest.approx(1.0)


def test_f1():
    t = np.array([1, 1, 0, 0])
    p = np.array([1, 0, 1, 0])
    cm = metrics.confusion_matrix(t, p, 2)
    np.testing.assert_allclose(float(metrics.f1_from_cm(cm)), 0.5, rtol=1e-6)


def test_streaming_accumulation():
    state = metrics.init_metric_state(2)
    state = metrics.update_metric_state(state, np.array([0, 1]), np.array([0, 1]))
    state = metrics.update_metric_state(state, np.array([1, 1]), np.array([0, 1]))
    out = metrics.finalize_metrics(state)
    np.testing.assert_allclose(float(out["accuracy"]), 0.75, rtol=1e-6)
