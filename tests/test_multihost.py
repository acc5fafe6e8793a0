"""Multi-host bootstrap smoke test on a real 2-process CPU cluster.

The reference's only cross-machine story is a Dask cluster
(utils/pc_tools.py:564-618); the TPU-native equivalent is
``jax.distributed.initialize`` + a global mesh with per-host data
sharding (SURVEY.md §2.9). A TPU pod isn't available here, but
jax.distributed works across CPU processes over Gloo — so this spawns
two real processes (2 local devices each -> one 4-device global mesh)
and checks the full bootstrap path end-to-end:

- parallel.mesh.initialize_distributed joins both processes;
- make_mesh builds the global data mesh;
- host_local_batch_to_global assembles per-process batch halves into
  global arrays (jax.make_array_from_process_local_data);
- make_parallel_train_step runs with cross-process gradient reduction,
  and both processes observe identical losses;
- the losses match a single-process run on the same global batch.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _single_process_losses(n_proc=2):
    """The same two train steps on the full global batch, one process."""
    from satellite_computervision_tpu.models import UNet, losses
    from satellite_computervision_tpu.train.trainer import (
        create_train_state,
        make_train_step,
    )

    model = UNet(n_classes=1, filters=(4,), factors=(2,), head="sigmoid")
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((1, 16, 16, 2)), tx=optax.adam(1e-2)
    )
    loss_fn = lambda y, p: losses.weighted_bce(y, p, pos_weight=1.0, logits=True)
    step = make_train_step(loss_fn, pred_key="logits", donate=False)

    rng = np.random.default_rng(7)
    gx = rng.normal(size=(2 * n_proc, 16, 16, 2)).astype(np.float32)
    gy = (gx[..., :1] > 0.5).astype(np.float32)
    out_losses = []
    for i in range(2):
        state, out = step(state, (gx, gy), jax.random.key(i))
        out_losses.append(float(out["loss"]))
    return out_losses


@pytest.mark.parametrize("n_proc", [2, 3], ids=["2proc", "3proc"])
def test_process_bootstrap_matches_single_process(tmp_path, n_proc):
    """n_proc=3 additionally stresses the orbax multi-writer path (and
    the sidecar-meta broadcast) beyond the minimal 2-process case."""
    port = _free_port()
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    try:
        import orbax.checkpoint  # noqa: F401
        ckpt_args = [str(tmp_path / "ckpt")]
    except ImportError:  # pragma: no cover
        ckpt_args = []

    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(port), str(p), str(n_proc)] + ckpt_args,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            cwd=REPO,
            text=True,
        )
        for p in range(n_proc)
    ]
    outs = []
    try:
        for p in procs:
            # generous: n_proc jit-compiling workers share this 1-core
            # host, and anything else running concurrently (a TPU example
            # generating chips) stretches wall time 2-3x (DEVNOTES.md)
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"

    losses = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, f"no RESULT line in worker output:\n{out}"
        losses.append(json.loads(lines[-1][len("RESULT "):]))
        if ckpt_args:  # cross-process orbax roundtrip ran in every worker
            assert "CKPT_OK" in out, f"sharded checkpoint failed:\n{out}"
        # cross-process sharded-hann == single-device engine, bitwise,
        # verified per-process on its addressable row shards
        assert "HANN_OK" in out, f"sharded hann parity failed:\n{out}"

    # every process observes the same replicated loss trajectory
    for other in losses[1:]:
        np.testing.assert_allclose(losses[0], other, rtol=1e-6)
    # and it matches the single-process run on the same global batch
    ref = _single_process_losses(n_proc)
    np.testing.assert_allclose(losses[0], ref, rtol=1e-4)
    assert losses[0][1] < losses[0][0]  # optimizer actually stepped
