"""Worker process for the multi-host bootstrap smoke test.

Spawned (twice) by tests/test_multihost.py: each process brings up 2
virtual CPU devices, joins a 2-process jax.distributed cluster over Gloo
(the CPU stand-in for a multi-host TPU slice's DCN bootstrap), builds the
global 4-device data mesh through parallel.mesh.make_mesh, assembles its
host-local batch shard into global arrays via host_local_batch_to_global
(per-host data sharding, SURVEY.md §2.9), and runs two data-parallel
train steps. Prints ``RESULT <json>`` with the per-step losses so the
parent test can check cross-process agreement and single-process parity.

Not a pytest module (no ``test_`` prefix) — run as
``python multihost_worker.py <port> <process_id> <num_processes> [ckpt]``.
"""

import os
import sys

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax

jax.config.update("jax_platforms", "cpu")

import json

import numpy as np
import jax.numpy as jnp
import optax


def main():
    port, pid, n_proc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    from satellite_computervision_tpu.parallel.mesh import (
        host_local_batch_to_global,
        initialize_distributed,
        make_mesh,
    )

    initialize_distributed(
        f"127.0.0.1:{port}", num_processes=n_proc, process_id=pid
    )
    assert jax.process_count() == n_proc, jax.process_count()
    assert len(jax.devices()) == 2 * n_proc and jax.local_device_count() == 2

    from satellite_computervision_tpu.models import UNet, losses
    from satellite_computervision_tpu.parallel.data_parallel import (
        make_parallel_train_step,
        shard_train_state,
    )
    from satellite_computervision_tpu.train.trainer import create_train_state

    mesh = make_mesh()  # 1-D data mesh over the 4 global devices
    model = UNet(n_classes=1, filters=(4,), factors=(2,), head="sigmoid")
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((1, 16, 16, 2)), tx=optax.adam(1e-2)
    )
    state = shard_train_state(state, mesh)
    loss_fn = lambda y, p: losses.weighted_bce(y, p, pos_weight=1.0, logits=True)
    step_fn = make_parallel_train_step(loss_fn, mesh, pred_key="logits")

    # deterministic global batch; each process loads ONLY its half (the
    # multi-host data-loading contract: no process sees the full batch)
    rng = np.random.default_rng(7)
    gx = rng.normal(size=(2 * n_proc, 16, 16, 2)).astype(np.float32)
    gy = (gx[..., :1] > 0.5).astype(np.float32)
    lo, hi = pid * 2, (pid + 1) * 2
    batch = host_local_batch_to_global((gx[lo:hi], gy[lo:hi]), mesh)

    losses_out = []
    for i in range(2):
        state, out = step_fn(state, batch, jax.random.key(i))
        losses_out.append(float(out["loss"]))

    # cross-process sharded checkpoint: all processes participate in one
    # orbax save (each writes its shards), then restore and verify a leaf
    ckpt_dir = sys.argv[4] if len(sys.argv) > 4 else None
    if ckpt_dir:
        from satellite_computervision_tpu.train.checkpoint import (
            load_checkpoint_orbax,
            save_checkpoint_orbax,
        )

        save_checkpoint_orbax(ckpt_dir, state, {"loss": losses_out[-1]}, step=2)
        restored, meta = load_checkpoint_orbax(ckpt_dir, state)
        leaf = jax.tree_util.tree_leaves(state.params)[0]
        rleaf = jax.tree_util.tree_leaves(restored.params)[0]
        assert meta["step"] == 2, meta
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(rleaf))
        print("CKPT_OK", flush=True)

    # cross-process sharded-hann scene inference: the DCN halo path
    # (ppermute chip-row exchange between PROCESSES over Gloo, not just
    # between local devices) must reproduce the single-device engine's
    # hann blend bitwise — every process checks its own addressable row
    # shards against a locally computed engine reference (SURVEY §2.9;
    # the reference's distributed scene path is utils/pc_tools.py:670-729)
    from satellite_computervision_tpu.inference import TiledInferenceEngine
    from satellite_computervision_tpu.parallel.spatial import make_spatial_inference

    k, b = 32, 16

    def avg3(x):
        out = x
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy or dx:
                    out = out + jnp.roll(x, (dy, dx), axis=(1, 2))
        return out[..., :1] / 9.0

    # tall enough that every device owns >= halo rows at any n_proc<=3
    scene = np.random.default_rng(11).normal(
        size=(14 * k + 5, 2 * k + 7, 2)
    ).astype(np.float32)
    spatial = make_spatial_inference(
        avg3, mesh, axis="data", kernel=k, buffer=b, blend="hann", batch_size=4,
    )
    got = spatial(scene)  # global array: only local shards addressable

    engine = TiledInferenceEngine(
        avg3, kernel=k, buffer=b, batch_size=4, out_channels=1,
        blend="hann", index_mode="grid",
    )
    want = np.asarray(engine.predict_scene(scene))
    assert got.shape == want.shape == scene.shape[:2] + (1,)
    checked = 0
    for shard in got.addressable_shards:
        np.testing.assert_array_equal(np.asarray(shard.data), want[shard.index])
        checked += int(np.asarray(shard.data).shape[0])
    assert checked > 0
    print(f"HANN_OK rows={checked}", flush=True)

    print("RESULT " + json.dumps(losses_out), flush=True)


if __name__ == "__main__":
    main()
