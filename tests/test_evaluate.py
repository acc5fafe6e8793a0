import numpy as np

from satellite_computervision_tpu.train.evaluate import (
    evaluate_confusion,
    format_confusion_report,
)
from satellite_computervision_tpu.utils import trace


def test_evaluate_confusion_perfect():
    y = np.random.default_rng(0).integers(0, 3, (2, 8, 8))
    onehot = np.eye(3, dtype=np.float32)[y]
    report = evaluate_confusion(lambda x: x, [(y, onehot)], 3, ["a", "b", "c"])
    assert report["overall"]["accuracy"] == 1.0
    assert report["per_class"]["a"]["iou"] == 1.0
    text = format_confusion_report(report)
    assert "overall" in text and "a" in text


def test_evaluate_confusion_counts():
    truth = np.array([[0, 0], [1, 1]])[None]
    pred = np.array([[0, 1], [1, 1]])[None]
    report = evaluate_confusion(lambda x: pred, [(None, truth)], 2)
    np.testing.assert_array_equal(report["counts"], [[1, 1], [0, 2]])
    assert report["per_class"]["1"]["recall"] == 1.0
    assert report["per_class"]["0"]["recall"] == 0.5


def test_profiler_trace_smoke(tmp_path):
    import jax.numpy as jnp

    with trace(str(tmp_path)):
        _ = jnp.ones((8, 8)) @ jnp.ones((8, 8))
    # a plugins/profile dir with an xplane file appears
    assert any(tmp_path.rglob("*.xplane.pb")) or any(tmp_path.iterdir())
