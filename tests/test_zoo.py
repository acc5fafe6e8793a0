"""Every reference model family trains one step through the zoo registry
(train/zoo.py) — the driver surface VERDICT r1 #8 asked for. Uses tiny
models; the CLI test drives scripts/train.py end-to-end on npy chips."""

import dataclasses
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from satellite_computervision_tpu.train import create_train_state
from satellite_computervision_tpu.train.trainer import make_train_step
from satellite_computervision_tpu.train.zoo import FAMILIES, get_family

sys.path.insert(0, "scripts")

TINY = {
    "unet": dict(filters=(4, 8), factors=(2, 2)),
    "deeplab": dict(stage_sizes=(1, 1, 1, 1), aspp_features=8),
    "siamese": dict(filters=(4, 8), factors=(2, 2)),
    "convlstm": dict(features=4),
    "lstm_autoencoder": dict(features=4),
    "hybrid": dict(filters=(4, 8), factors=(2, 2), lstm_features=4),
    "acnn": dict(n_blocks=4, features=4),
    "hierarchical": dict(n_blocks=4, features=4, lstm_features=4),
}


@pytest.mark.parametrize("family_name", sorted(FAMILIES))
def test_family_one_train_step(family_name, rng):
    fam = get_family(family_name)
    model = fam.build(None, **TINY[family_name])
    inputs = tuple(jnp.asarray(a) for a in fam.example_inputs(None))
    labels = fam.example_labels(None)
    if isinstance(labels, tuple):
        labels = tuple(jnp.asarray(rng.uniform(0, 1, a.shape).astype(np.float32))
                       for a in labels)
    else:
        labels = jnp.asarray(rng.uniform(0, 1, labels.shape).astype(np.float32))
    # random inputs so the loss is non-degenerate
    inputs = tuple(
        jnp.asarray(rng.normal(size=a.shape).astype(np.float32) * 0.1) for a in inputs
    )

    state = create_train_state(
        model, jax.random.key(0), inputs[0], tx=optax.adam(1e-3),
        model_args=inputs[1:],
    )
    loss_fn, pred_key = fam.loss(None)
    step = make_train_step(loss_fn, pred_key, num_classes=2, donate=False)
    new_state, out = step(state, (inputs, labels), jax.random.key(1))
    assert np.isfinite(float(out["loss"])), f"{family_name}: non-finite loss"
    assert int(new_state.step) == 1


def test_unknown_family_raises():
    with pytest.raises(KeyError, match="unknown model family"):
        get_family("resnet-gpt")


def test_cli_trains_siamese_on_npy_chips(tmp_path, monkeypatch):
    import train as train_cli

    from satellite_computervision_tpu import testing as fx
    from satellite_computervision_tpu.train.config import CHANGE_CONFIG
    from satellite_computervision_tpu.train import zoo

    tree = fx.make_siamese_chip_tree(str(tmp_path / "chips"), n_chips=4, dim=32)
    small = dataclasses.replace(CHANGE_CONFIG, kernel_size=32, batch_size=2)
    monkeypatch.setitem(train_cli.CONFIGS, "change", small)
    orig = zoo.FAMILIES["siamese"]
    monkeypatch.setitem(
        zoo.FAMILIES, "siamese",
        dataclasses.replace(
            orig, build=lambda cfg, **kw: orig.build(cfg, filters=(4,), factors=(2,), **kw)
        ),
    )

    ckpt = str(tmp_path / "run")
    train_cli.main([
        "--config", "change",
        "--before", str(tmp_path / "chips/before/*.npy"),
        "--after", str(tmp_path / "chips/after/*.npy"),
        "--labels", str(tmp_path / "chips/label/*.npy"),
        "--ckpt", ckpt, "--epochs", "1", "--steps-per-epoch", "2",
    ])
    assert (tmp_path / "run" / "best" / "state.msgpack").exists()


def test_cli_trains_hierarchical_on_npy_chips(tmp_path, monkeypatch):
    """The 3-head hierarchical family through scripts/train.py: hybrid-style
    npy inputs, coarsened-class targets for the auxiliary sub head."""
    import train as train_cli

    from satellite_computervision_tpu import testing as fx
    from satellite_computervision_tpu.train.config import LANDCOVER_CONFIG
    from satellite_computervision_tpu.train import zoo

    fx.make_npy_chip_tree(
        str(tmp_path / "chips"), sources={"naip": (4, 255.0)},
        n_chips=4, dim=32, n_classes=8,
    )
    fx.make_series_chips(str(tmp_path / "series"), n_chips=4, n_time=6, dim=16)
    small = dataclasses.replace(LANDCOVER_CONFIG, kernel_size=32, batch_size=2)
    monkeypatch.setitem(train_cli.CONFIGS, "landcover", small)
    orig = zoo.FAMILIES["hierarchical"]
    monkeypatch.setitem(
        zoo.FAMILIES, "hierarchical",
        dataclasses.replace(
            orig, build=lambda cfg, **kw: orig.build(cfg, **{**TINY["hierarchical"], **kw})
        ),
    )

    ckpt = str(tmp_path / "run")
    train_cli.main([
        "--config", "landcover", "--model", "hierarchical",
        "--unet-source", f"naip={tmp_path}/chips/naip/*.npy",
        "--series", str(tmp_path / "series/*.npy"),
        "--series-dim", "16",
        "--labels", str(tmp_path / "chips/label/*.npy"),
        "--ckpt", ckpt, "--epochs", "1", "--steps-per-epoch", "2",
    ])
    assert (tmp_path / "run" / "best" / "state.msgpack").exists()


def test_cli_trains_wetland_hybrid(tmp_path, monkeypatch):
    """The wetland workload (reference capability; its azure/
    train_wetland.py driver is absent from the snapshot): hybrid model,
    S1+S2 series + terrain planes, binary via 2-class softmax."""
    import train as train_cli

    from satellite_computervision_tpu import testing as fx
    from satellite_computervision_tpu.train.config import WETLAND_CONFIG
    from satellite_computervision_tpu.train import zoo

    # naip here: an unmasked source whose channel count matches the init
    # example (masked sources like dem append a NaN-mask channel)
    fx.make_npy_chip_tree(
        str(tmp_path / "chips"), sources={"naip": (6, 255.0)},
        n_chips=4, dim=32, n_classes=2,
    )
    fx.make_series_chips(str(tmp_path / "series"), n_chips=4, n_time=6,
                         channels=6, dim=16)
    small = dataclasses.replace(WETLAND_CONFIG, kernel_size=32, batch_size=2)
    monkeypatch.setitem(train_cli.CONFIGS, "wetland", small)
    orig = zoo.FAMILIES["hybrid"]
    monkeypatch.setitem(
        zoo.FAMILIES, "hybrid",
        dataclasses.replace(
            orig, build=lambda cfg, **kw: orig.build(cfg, **{**TINY["hybrid"], **kw})
        ),
    )

    ckpt = str(tmp_path / "run")
    train_cli.main([
        "--config", "wetland",
        "--unet-source", f"naip={tmp_path}/chips/naip/*.npy",
        "--series", str(tmp_path / "series/*.npy"),
        "--series-dim", "16",
        "--labels", str(tmp_path / "chips/label/*.npy"),
        "--ckpt", ckpt, "--epochs", "1", "--steps-per-epoch", "2",
    ])
    assert (tmp_path / "run" / "best" / "state.msgpack").exists()


def test_cli_trains_convlstm_on_series(tmp_path, monkeypatch):
    import train as train_cli

    from satellite_computervision_tpu import testing as fx
    from satellite_computervision_tpu.train.config import TIMESERIES_CONFIG
    from satellite_computervision_tpu.train import zoo

    fx.make_series_chips(str(tmp_path / "series"), n_chips=4, n_time=7, dim=16)
    small = dataclasses.replace(TIMESERIES_CONFIG, batch_size=2, n_time=6)
    monkeypatch.setitem(train_cli.CONFIGS, "timeseries", small)
    orig = zoo.FAMILIES["convlstm"]
    monkeypatch.setitem(
        zoo.FAMILIES, "convlstm",
        dataclasses.replace(
            orig, build=lambda cfg, **kw: orig.build(cfg, features=4, **kw)
        ),
    )

    ckpt = str(tmp_path / "run")
    train_cli.main([
        "--config", "timeseries",
        "--series", str(tmp_path / "series/*.npy"),
        "--series-dim", "16",
        "--ckpt", ckpt, "--epochs", "1", "--steps-per-epoch", "2",
    ])
    assert (tmp_path / "run" / "best" / "state.msgpack").exists()
