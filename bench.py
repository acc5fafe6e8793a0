"""Benchmark: full-scene tiled inference throughput (the north-star metric).

Compares the framework's batched, device-resident overlap-tile engine
against the reference's inference pattern — one synchronous batch-1
``model.predict`` per chip with host round-trips and host-side stitching
(utils/prediction_tools.py:133-156) — using the SAME model and chip
geometry (BASELINE.json config #1: solar U-Net, 256x256 kernel + 128
buffer, 4-band Sentinel-2 scene) on the same device.

Prints ONE JSON line with the headline MPix/s + vs_baseline plus the
device-resident fields (see BASELINE.md "Captured-ratio record" for how
each ratio maps to the >10x target):
  vs_baseline            wire-level interleaved-pairs ratio (link-bound
                         at ~5-6x on this relay; README perf notes)
  ref_syncloop_ms /      the reference loop AS IT RUNS (one host sync per
  vs_refloop             chip) vs the one-compiled-program engine — the
                         architecture ratio, 10x-class on any host
  ref_device_ms /        pure on-chip compute ratio (bounded ~4-5x by
  vs_baseline_device     overlap redundancy x precision; r4 decision
                         record, ROADMAP.md)
  mfu_tuned / train_*    serving + train-step efficiency (donate=True =
                         the Trainer's real configuration)

ROBUSTNESS CONTRACT (round-5, after BENCH_r04 timed out with zero
output): the run is time-budgeted (SCV_BENCH_BUDGET seconds, default
1200) and the JSON line is emitted no matter what — stages fold fields
into one result dict incrementally; a watchdog thread prints the dict
and exits just before the budget expires; SIGTERM/SIGINT and normal
interpreter exit also print it. Stages are ordered so the required
fields land first; a stage that would not fit the remaining budget is
skipped and named in the JSON's "skipped" list. All exploratory probes
live behind flags and never run in the default path.
"""

import atexit
import json
import os
import signal
import sys
import threading
import time

import numpy as np

import jax
import jax.numpy as jnp

KERNEL, BUFFER, BANDS = 256, 128, 4
SCENE = 1920  # pixels per side; reference-mode grid -> 6x6 chips
BATCH = 12  # chips per forward group per scene (x N_SCENES under vmap)
N_SCENES = 6  # pipelined sweep length (multi-state workload shape)


def _enable_compile_cache():
    """Persistent XLA compilation cache: first-run compiles (minutes over
    the TPU tunnel) amortize across processes. The driver's round-end run
    reuses the entries this round's in-round runs created."""
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


_enable_compile_cache()

from satellite_computervision_tpu.inference import TiledInferenceEngine  # noqa: E402
from satellite_computervision_tpu.models import UNet, fold_unet_variables  # noqa: E402
from satellite_computervision_tpu.ops.chips import generate_chip_indices  # noqa: E402

# v5e bf16 peak (197 TFLOP/s) — the MFU denominator for this chip
PEAK_FLOPS = 197e12

# ---------------------------------------------------------------------------
# Emit-once plumbing: the driver parses exactly one JSON line; make sure it
# exists even if a stage hangs in a cold compile or the process is killed.
# ---------------------------------------------------------------------------

RESULT = {
    "metric": "tiled-inference scene throughput, solar U-Net 256+128 "
    "4-band, pipelined uint16 scenes (vs reference batch-1 per-chip "
    "predict loop, interleaved pairs)",
    "value": None,
    "unit": "MPix/s",
    "vs_baseline": None,
}
# RLock: the SIGTERM handler runs on the main thread and may interrupt
# emit() mid-print — a plain Lock would self-deadlock exactly when the
# guards matter most (_EMITTED flips before print, so re-entry no-ops)
_EMIT_LOCK = threading.RLock()
_EMITTED = False


def emit():
    global _EMITTED
    with _EMIT_LOCK:
        if _EMITTED:
            return
        _EMITTED = True
        print(json.dumps(RESULT), flush=True)


def _install_guards(budget: float):
    """Watchdog + signal + atexit: one of them always prints the line."""

    def _die(*_a):
        emit()
        os._exit(0)

    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            signal.signal(sig, _die)
        except (ValueError, OSError):
            pass
    atexit.register(emit)
    # emit 15 s before the budget so stdout flushes before any hard kill
    watchdog = threading.Timer(max(budget - 15.0, 5.0), _die)
    watchdog.daemon = True
    watchdog.start()
    return watchdog


def build_model():
    model = UNet(
        n_classes=1,
        filters=(32, 64, 128, 256, 512),
        factors=(2, 2, 2, 2, 2),
        head="sigmoid",
        dtype=jnp.bfloat16,
    )
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, KERNEL + BUFFER, KERNEL + BUFFER, BANDS))
    )
    return model, variables


def build_folded_predict(model, variables):
    """Serving-mode forward: BN folded into conv weights (models/fold.py)
    — numerically identical to eval-mode BN, fewer ops in the program."""
    folded_model, folded_vars = fold_unet_variables(model, variables)
    return lambda chips: folded_model.apply(folded_vars, chips)["probs"]


def make_engine(model, variables):
    predict = lambda chips: model.apply(variables, chips)["probs"]
    return TiledInferenceEngine(
        predict,
        kernel=KERNEL,
        buffer=BUFFER,
        batch_size=BATCH,
        out_channels=1,
        blend="overwrite",
        index_mode="reference",
        preprocess_fn=lambda s: s.astype(jnp.float32) / 10000.0,
        output_transform=lambda p: (p * 255.0).astype(jnp.uint8),
    )


def bench_ours(engine, scenes, repeats=2):
    # compile + warm (np.asarray: this backend's block_until_ready does not
    # reliably wait; a D2H read does)
    np.asarray(engine.predict_scene(jnp.asarray(scenes[0])))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        # three-stage pipeline: thread-staged uint16 H2D / async program
        # dispatch / uint8 D2H readback — steady state approaches the
        # relay-link ceiling (see README perf notes); every prediction is
        # materialized to host NumPy, as an export path would need
        for _out in engine.predict_scenes(scenes, readback=True):
            pass
        times.append((time.perf_counter() - t0) / len(scenes))
    return min(times)  # seconds per scene, steady state


def bench_reference_pattern(model, variables, scene_u16):
    """The reference loop: batch-1 forward per chip, float32 host transfer
    per chip, numpy stitching (utils/prediction_tools.py:133-156). All 36
    grid chips are timed."""
    half = BUFFER // 2
    idx = generate_chip_indices(SCENE, SCENE, KERNEL, BUFFER, mode="reference")
    predict1 = jax.jit(
        lambda chip: model.apply(variables, chip[None])["probs"][0]
    )
    scene_np = scene_u16.astype(np.float32) / 10000.0
    chip0 = scene_np[idx[0][0] - half : idx[0][0] + KERNEL + half,
                     idx[0][1] - half : idx[0][1] + KERNEL + half]
    np.asarray(predict1(jnp.asarray(chip0)))  # warm

    template = np.zeros((SCENE, SCENE), np.float32)
    t0 = time.perf_counter()
    for y, x in idx:
        chip = scene_np[y - half : y + KERNEL + half, x - half : x + KERNEL + half]
        pred = np.asarray(predict1(jnp.asarray(chip)))  # host->dev, dev->host
        template[y : y + KERNEL, x : x + KERNEL] += pred[half : half + KERNEL,
                                                         half : half + KERNEL, 0]
    return time.perf_counter() - t0


def _timed_scalar(jitted, *args, reps=5):
    """Device time via a full-output reduction + 1-element readback (this
    backend's block_until_ready is unreliable; a single-pixel probe lets
    XLA dead-code the program — see profile_ops)."""
    np.asarray(jitted(*args))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(jitted(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def _sub_floor(t, floor):
    """Subtract the readback floor, clamped away from zero: very fast
    programs can measure under the floor (link jitter), and a negative or
    zero time would print absurd ms / infinite MFU."""
    return max(t - floor, 1e-9)


def _flops_of(jitted, *args):
    try:
        analysis = jitted.lower(*args).compile().cost_analysis()
        if isinstance(analysis, (list, tuple)):
            analysis = analysis[0]
        return float(analysis.get("flops", float("nan")))
    except Exception:
        return float("nan")


# ---------------------------------------------------------------------------
# Stages. Each writes its fields into RESULT as soon as they are measured,
# so a mid-run kill still captures everything completed so far.
# ---------------------------------------------------------------------------


def stage_headline(model, variables, scenes):
    """value + vs_baseline: wire-level interleaved pairs. The relay link's
    bandwidth drifts minute-to-minute (identical sweeps have measured
    2-3x apart; DEVNOTES.md) and both sides are transfer-bound on it, so
    ours/ref are measured INTERLEAVED in pairs — each pair sees the same
    link regime — and the ratio is the median of paired ratios."""
    engine = make_engine(model, variables)
    pairs = []
    for _ in range(2):
        ours_s = bench_ours(engine, scenes, repeats=2)
        ref_s = bench_reference_pattern(model, variables, scenes[0])
        pairs.append((ours_s, ref_s))
        # fold in after EVERY pair: one completed pair already carries the
        # headline if the budget expires mid-stage
        mpix = SCENE * SCENE / 1e6
        ratios = sorted(r / o for o, r in pairs)
        n = len(ratios)
        median = (ratios[n // 2] if n % 2
                  else (ratios[n // 2 - 1] + ratios[n // 2]) / 2)
        RESULT["value"] = round(mpix / min(o for o, _ in pairs), 3)
        RESULT["vs_baseline"] = round(median, 2)


def _floor(staged):
    floor_fn = jax.jit(lambda s: s[0, 0, 0].astype(jnp.float32) * 2)
    return _timed_scalar(floor_fn, staged)


def stage_device_ratios(model, variables, staged, ctx):
    """The ratios the >10x target resolves through (BASELINE.md addendum):
    ref_syncloop_ms / vs_refloop (architecture) and ref_device_ms /
    vs_baseline_device (pure compute), plus the tuned serving geometry."""
    out = RESULT
    pre = lambda s: s.astype(jnp.float32) / 10000.0
    post = lambda p: (p * 255.0).astype(jnp.uint8)
    floor = ctx["floor"] = _floor(staged)
    mpix = SCENE * SCENE / 1e6

    # S2D production fast path: the space-to-depth solar variant (equal
    # quality — IoU 0.9950 vs 0.9947 plain, runs/solar_convergence_s2d.
    # jsonl) folds 2x2 pixels into channels before the trunk, quadrupling
    # MXU lane occupancy at the shallow levels; composed with whole-scene
    # mode it is the fastest serving config on this chip.
    s2d_model = UNet(
        n_classes=1, filters=(32, 64, 128, 256, 512), factors=(2, 2, 2, 2, 2),
        head="sigmoid", dtype=jnp.bfloat16, space_to_depth=True,
    )
    s2d_vars = s2d_model.init(
        jax.random.key(1), jnp.zeros((1, KERNEL + BUFFER, KERNEL + BUFFER, BANDS))
    )
    s2d_predict = build_folded_predict(s2d_model, s2d_vars)
    s2d_whole = TiledInferenceEngine(
        s2d_predict, kernel=KERNEL, buffer=BUFFER, batch_size=BATCH,
        out_channels=1, tile_mode="whole", whole_multiple=64,
        preprocess_fn=pre, output_transform=post,
    )
    impl = s2d_whole._build((SCENE, SCENE, BANDS), staged.dtype)
    run = jax.jit(lambda s, impl=impl: impl(s).astype(jnp.float32).sum())
    t_s2d = _sub_floor(_timed_scalar(run, staged), floor)
    out["s2d_whole_ms"] = round(t_s2d * 1e3, 1)
    out["mpix_s2d"] = round(mpix / t_s2d, 1)
    out["mfu_s2d"] = round(_flops_of(jax.jit(impl), staged) / t_s2d / PEAK_FLOPS, 3)

    # tuned geometry (r3 probes): XLA's conv efficiency peaks around
    # batch-16 x ~600^2 chips — kernel 512 + the same 128 buffer covers
    # 1920^2 with a 4x4 grid at ~2x the k256 grid's throughput. This is
    # the reference-weight-compatible fast path (SOLAR_CONFIG serving
    # geometry).
    folded = build_folded_predict(model, variables)
    tuned = TiledInferenceEngine(
        folded, kernel=512, buffer=BUFFER, batch_size=16,
        out_channels=1, blend="hann", index_mode="grid",
        preprocess_fn=pre, output_transform=post,
    )
    impl = tuned._build((SCENE, SCENE, BANDS), staged.dtype)
    run = jax.jit(lambda s, impl=impl: impl(s).astype(jnp.float32).sum())
    t_tuned = _sub_floor(_timed_scalar(run, staged), floor)
    out["hann_tuned_ms"] = round(t_tuned * 1e3, 1)
    out["mfu_tuned"] = round(
        _flops_of(jax.jit(impl), staged) / t_tuned / PEAK_FLOPS, 3)
    out["mpix_device_tuned"] = round(mpix / t_tuned, 1)

    # Reference-pattern DEVICE time on the same scene: float32 batch-1
    # forwards, one per 384^2 chip (utils/prediction_tools.py:133-156
    # runs Keras float32 model.predict per chip). Measured as ALL chip
    # programs dispatched back-to-back with ONE final sync — the device
    # executes every small program while launch overhead pipelines to
    # ~zero (cross-checked vs an unrolled single program by
    # --probe-ref-device: 84.2 vs 81.4 ms, r4). Deliberately EXCLUDES the
    # reference loop's per-chip synchronous host round trips; those are
    # ref_syncloop_ms below.
    f32_model = UNet(
        n_classes=1, filters=(32, 64, 128, 256, 512), factors=(2, 2, 2, 2, 2),
        head="sigmoid", dtype=jnp.float32,
    )
    idx = generate_chip_indices(SCENE, SCENE, KERNEL, BUFFER, mode="reference")
    side, halfb = KERNEL + BUFFER, BUFFER // 2
    scene_f = staged.astype(jnp.float32) / 10000.0
    chips_dev = [
        jax.device_put(
            jax.lax.dynamic_slice(scene_f, (y - halfb, x - halfb, 0),
                                  (side, side, BANDS)))
        for (y, x) in idx
    ]
    ref1 = jax.jit(lambda c: f32_model.apply(variables, c[None])["probs"])
    np.asarray(ref1(chips_dev[0]).sum())  # warm the compile
    t_ref = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [ref1(c) for c in chips_dev]
        np.asarray(sum(o.sum() for o in outs))
        t_ref = min(t_ref, time.perf_counter() - t0)
    t_ref = _sub_floor(t_ref, floor)
    out["ref_device_ms"] = round(t_ref * 1e3, 1)
    # device-time ratios: pure on-chip compute — the floor of the true
    # advantage, bounded by the FLOP/precision/redundancy gap alone
    # (~2.25x overlap redundancy x bf16; ROADMAP r4 decision record),
    # NOT a 10x-class number.
    out["vs_baseline_device"] = round(t_ref / t_s2d, 1)
    out["vs_baseline_device_tuned"] = round(t_ref / t_tuned, 1)

    # The reference loop AS IT ACTUALLY RUNS: one synchronous host round
    # trip per chip (predict -> numpy append, utils/prediction_tools.py:
    # 146-153). This is architecture, not wire: every per-chip sync stalls
    # the device on the host regardless of link speed. vs_refloop is the
    # engine's end-to-end advantage over that pattern on identical
    # hardware — the number the one-compiled-program design exists for.
    t_sync = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for c in chips_dev:
            np.asarray(ref1(c))
        t_sync = min(t_sync, time.perf_counter() - t0)
    out["ref_syncloop_ms"] = round(t_sync * 1e3, 1)
    out["vs_refloop"] = round(t_sync / t_s2d, 1)
    out["vs_refloop_tuned"] = round(t_sync / t_tuned, 1)


def stage_train(ctx):
    """The solar train step (README config: batch 16, 256^2, 6 bands,
    bf16) + the measured-winner geometries, all with donate=True — the
    Trainer's actual default (train/trainer.py), unlike r3/r4's
    donate=False runs."""
    from satellite_computervision_tpu.models.losses import weighted_bce
    from satellite_computervision_tpu.train.trainer import (
        create_train_state,
        make_train_step,
    )

    floor = ctx.get("floor", 0.0)
    rng = np.random.default_rng(1)

    def timed_step(tmodel, x, y):
        state = create_train_state(tmodel, jax.random.key(0), x)
        step = make_train_step(
            lambda t, p: weighted_bce(t, p, pos_weight=2.0, logits=True),
            donate=True,
        )
        state, m = step(state, (x, y))
        np.asarray(m["loss"])  # compile + warm
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            state, m = step(state, (x, y))
            np.asarray(m["loss"])
            best = min(best, time.perf_counter() - t0)
        return _sub_floor(best - floor, 0.0), _flops_of(step, state, (x, y))

    def data(batch, tile, bands=6):
        x = jnp.asarray(rng.normal(size=(batch, tile, tile, bands)).astype(np.float32))
        y = jnp.asarray(
            (rng.uniform(size=(batch, tile, tile, 1)) > 0.8).astype(np.float32))
        return x, y

    plain = UNet(
        n_classes=1, filters=(32, 64, 128, 256, 512), factors=(2, 2, 2, 2, 2),
        head="sigmoid", dtype=jnp.bfloat16, bn_momentum=0.9,
    )
    s2d = UNet(
        n_classes=1, filters=(32, 64, 128, 256, 512), factors=(2, 2, 2, 2, 2),
        head="sigmoid", dtype=jnp.bfloat16, bn_momentum=0.9,
        space_to_depth=True,
    )

    # reference config: batch 16, 256^2 (solar nb cell 17)
    x, y = data(16, 256)
    t, fl = timed_step(plain, x, y)
    RESULT["train_ms_per_step"] = round(t * 1e3, 1)
    RESULT["train_mfu"] = round(fl / t / PEAK_FLOPS, 3)
    RESULT["train_mpix"] = round(16 * 256 * 256 / t / 1e6, 1)

    # tuned geometry (bench.py --probe-traingeo, measured r4): batch 64 at
    # the SAME 256^2 tile — batch is the XLA conv-tiling lever here, and
    # it applies to TFRecord-fed training too (no chip re-cut), so
    # SOLAR_CONFIG carries train_batch=64. Quality:
    # runs/solar_convergence_b64.jsonl (IoU 0.9953).
    xt, yt = data(64, 256)
    t, fl = timed_step(plain, xt, yt)
    RESULT["train_tuned_ms_per_step"] = round(t * 1e3, 1)
    RESULT["train_mfu_tuned"] = round(fl / t / PEAK_FLOPS, 3)
    RESULT["train_mpix_tuned"] = round(64 * 256 * 256 / t / 1e6, 1)

    # S2D stem at both batches: the from-scratch preset default (quality:
    # runs/solar_convergence_s2d.jsonl 0.9950 b16,
    # runs/solar_convergence_s2d_b64.jsonl 0.9938 b64). MFU is relative to
    # each network's OWN FLOPs — S2D folds the shallow levels so its MFU
    # reads low while its wall-clock is faster; train_mpix_* is the
    # architecture-neutral metric.
    t, fl = timed_step(s2d, x, y)
    RESULT["train_s2d_ms_per_step"] = round(t * 1e3, 1)
    RESULT["train_mfu_s2d"] = round(fl / t / PEAK_FLOPS, 3)
    RESULT["train_mpix_s2d"] = round(16 * 256 * 256 / t / 1e6, 1)

    t, fl = timed_step(s2d, xt, yt)
    RESULT["train_s2d_b64_ms_per_step"] = round(t * 1e3, 1)
    RESULT["train_mpix_s2d_b64"] = round(64 * 256 * 256 / t / 1e6, 1)


def stage_extras(model, variables, staged, ctx):
    """Regression-guard fields: whole-scene live vs folded BN, hann blend
    XLA vs Pallas. These have been stable since r3 (folding neutral,
    Pallas at parity; ROADMAP decision records) — measured last."""
    pre = lambda s: s.astype(jnp.float32) / 10000.0
    post = lambda p: (p * 255.0).astype(jnp.uint8)
    floor = ctx.get("floor")
    if floor is None:
        floor = ctx["floor"] = _floor(staged)

    live = lambda chips: model.apply(variables, chips)["probs"]
    folded = build_folded_predict(model, variables)
    for tag, predict in (("", live), ("_fold", folded)):
        whole = TiledInferenceEngine(
            predict, kernel=KERNEL, buffer=BUFFER, batch_size=BATCH,
            out_channels=1, tile_mode="whole", preprocess_fn=pre,
            output_transform=post,
        )
        impl = whole._build((SCENE, SCENE, BANDS), staged.dtype)
        run = jax.jit(lambda s, impl=impl: impl(s).astype(jnp.float32).sum())
        t = _sub_floor(_timed_scalar(run, staged), floor)
        RESULT[f"whole_ms{tag}"] = round(t * 1e3, 1)
        if tag == "_fold":
            flops = _flops_of(jax.jit(impl), staged)
            RESULT["mfu_whole"] = round(flops / t / PEAK_FLOPS, 3)

    # seam-free production config at the k256 grid: hann blend, XLA
    # quadrant adds vs the Pallas stitch-accumulate kernel
    for tag, pallas in (("", False), ("_pallas", True)):
        hann = TiledInferenceEngine(
            folded, kernel=KERNEL, buffer=BUFFER, batch_size=BATCH,
            out_channels=1, blend="hann", index_mode="grid",
            preprocess_fn=pre, output_transform=post, pallas_blend=pallas,
        )
        impl = hann._build((SCENE, SCENE, BANDS), staged.dtype)
        run = jax.jit(lambda s, impl=impl: impl(s).astype(jnp.float32).sum())
        RESULT[f"hann_ms{tag}"] = round(
            _sub_floor(_timed_scalar(run, staged), floor) * 1e3, 1)


def stage_codec():
    """Host-side geo-codec throughput: native LZW encode/decode MB/s on a
    predictor-2-differenced satellite-like uint8 plane — the hot loop of
    the streaming COG writer/reader (geo/geotiff.py; native scv_lzw_*).
    Complements the end-to-end swath demo (bench.py --swath,
    runs/swath_codec_sweep.jsonl) with a number the driver captures every
    round. Host-only: no device programs, ~1 s."""
    from satellite_computervision_tpu import native

    if native.get_lib() is None:
        return
    rng = np.random.default_rng(0)
    plane = rng.integers(0, 7, (2048, 4096), dtype=np.uint8).cumsum(
        axis=1).astype(np.uint8)
    diff = plane.copy()
    diff[:, 1:] = plane[:, 1:] - plane[:, :-1]
    raw = diff.tobytes()
    enc = native.lzw_encode(raw)
    if enc is None or native.lzw_decode(enc, len(raw)) != raw:
        return
    n, mb = 3, len(raw) / 1e6
    t0 = time.perf_counter()
    for _ in range(n):
        native.lzw_encode(raw)
    enc_s = (time.perf_counter() - t0) / n
    t0 = time.perf_counter()
    for _ in range(n):
        native.lzw_decode(enc, len(raw))
    dec_s = (time.perf_counter() - t0) / n
    RESULT["lzw_enc_mb_s"] = round(mb / enc_s, 1)
    RESULT["lzw_dec_mb_s"] = round(mb / dec_s, 1)
    RESULT["lzw_ratio"] = round(len(raw) / len(enc), 2)


def main():
    budget = float(os.environ.get("SCV_BENCH_BUDGET", "1200"))
    deadline = time.monotonic() + budget
    watchdog = _install_guards(budget)

    rng = np.random.default_rng(0)
    scenes = [
        rng.integers(0, 3000, (SCENE, SCENE, BANDS)).astype(np.uint16)
        for _ in range(N_SCENES)
    ]
    model, variables = build_model()
    staged = jax.device_put(jnp.asarray(scenes[0]))
    ctx = {}

    # (name, warm-cache estimate seconds, thunk). Ordered by importance:
    # a stage only starts if its estimate fits the remaining budget, and
    # every field lands in RESULT the moment it is measured.
    stages = [
        ("headline", 150, lambda: stage_headline(model, variables, scenes)),
        ("device_ratios", 90,
         lambda: stage_device_ratios(model, variables, staged, ctx)),
        ("train", 90, lambda: stage_train(ctx)),
        ("extras", 60, lambda: stage_extras(model, variables, staged, ctx)),
        ("codec", 10, stage_codec),
    ]
    for name, est, thunk in stages:
        if deadline - time.monotonic() < est:
            RESULT.setdefault("skipped", []).append(name)
            continue
        try:
            thunk()
        except Exception as e:  # a broken stage must not cost the round
            RESULT.setdefault("errors", {})[name] = f"{type(e).__name__}: {e}"
    RESULT["bench_seconds"] = round(time.monotonic() - (deadline - budget), 1)
    watchdog.cancel()
    emit()


def overlap_experiment():
    """--overlap: can thread-staged H2D hide behind compute on this relay?"""
    import threading

    rng = np.random.default_rng(0)
    stacks = [
        rng.integers(0, 3000, (N_SCENES, SCENE, SCENE, BANDS)).astype(np.uint16)
        for _ in range(2)
    ]
    model, variables = build_model()
    engine = make_engine(model, variables)
    np.asarray(engine.predict_scene_batch(stacks[0]))  # warm via cache

    t0 = time.perf_counter()
    for s in stacks * 2:
        np.asarray(engine.predict_scene_batch(s))
    serial = time.perf_counter() - t0

    t0 = time.perf_counter()
    staged = jax.device_put(stacks[0])
    for i in range(4):
        holder = {}
        th = threading.Thread(
            target=lambda: holder.setdefault("d", jax.device_put(stacks[(i + 1) % 2]))
        )
        th.start()
        np.asarray(engine.predict_scene_batch(staged))
        th.join()
        staged = holder["d"]
    piped = time.perf_counter() - t0
    print(f"serial 4 sweeps: {serial:.2f}s; thread-staged: {piped:.2f}s "
          f"({serial / piped:.2f}x)")


def profile_components():
    """--profile: per-leg timing of the scene pipeline on this backend —
    H2D (uint16 scene), device compute, D2H (uint8 preds), and the
    pipelined predict_scenes sweep vs the one-shot stacked program."""
    rng = np.random.default_rng(0)
    scenes = [
        rng.integers(0, 3000, (SCENE, SCENE, BANDS)).astype(np.uint16)
        for _ in range(N_SCENES)
    ]
    model, variables = build_model()
    engine = make_engine(model, variables)
    mpix = SCENE * SCENE / 1e6

    # warm the per-scene program
    staged = jax.device_put(scenes[0])
    np.asarray(engine.predict_scene(staged))

    def t(fn, n=3):
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    h2d = t(lambda: np.asarray(jax.device_put(scenes[1])[0, 0, 0]))
    pred = engine.predict_scene(staged)
    d2h = t(lambda: np.asarray(pred))
    # compute incl. minimal sync (1-element readback)
    comp = t(lambda: np.asarray(engine.predict_scene(staged)[0, 0, 0]))
    print(f"scene {SCENE}x{SCENE}x{BANDS} uint16 = "
          f"{scenes[0].nbytes / 1e6:.1f} MB in, {pred.nbytes / 1e6:.1f} MB out")
    print(f"H2D:     {h2d:.3f}s ({scenes[0].nbytes / 1e6 / h2d:.0f} MB/s)")
    print(f"compute: {comp:.3f}s ({mpix / comp:.1f} MPix/s device-resident)")
    print(f"D2H:     {d2h:.3f}s ({pred.nbytes / 1e6 / d2h:.0f} MB/s)")

    t0 = time.perf_counter()
    for out in engine.predict_scenes(scenes):
        np.asarray(out)
    piped = (time.perf_counter() - t0) / len(scenes)
    print(f"2-stage predict_scenes: {piped:.3f}s/scene ({mpix / piped:.2f} MPix/s)")

    t0 = time.perf_counter()
    for out in engine.predict_scenes(scenes, readback=True):
        pass
    piped3 = (time.perf_counter() - t0) / len(scenes)
    print(f"3-stage predict_scenes: {piped3:.3f}s/scene ({mpix / piped3:.2f} MPix/s)")

    stack = np.stack(scenes)
    np.asarray(engine.predict_scene_batch(stack))  # warm
    t0 = time.perf_counter()
    np.asarray(engine.predict_scene_batch(stack))
    stacked = (time.perf_counter() - t0) / len(scenes)
    print(f"stacked predict_scene_batch: {stacked:.3f}s/scene ({mpix / stacked:.2f} MPix/s)")

    # production seam-free mode: hann feathering over the full-cover grid
    hann = TiledInferenceEngine(
        engine.predict_fn, kernel=KERNEL, buffer=BUFFER, batch_size=BATCH,
        out_channels=1, blend="hann", index_mode="grid",
        preprocess_fn=engine.preprocess_fn, output_transform=engine.output_transform,
    )
    np.asarray(hann.predict_scene(staged))  # compile + warm
    hann_comp = t(lambda: np.asarray(hann.predict_scene(staged)[0, 0, 0]))
    print(f"hann device-resident: {hann_comp:.3f}s "
          f"({mpix / hann_comp:.1f} MPix/s; 64-chip full-cover grid + blend "
          f"vs overwrite's 36-chip reference grid)")
    t0 = time.perf_counter()
    for out in hann.predict_scenes(scenes, readback=True):
        pass
    hann_s = (time.perf_counter() - t0) / len(scenes)
    print(f"hann-blend pipeline: {hann_s:.3f}s/scene ({mpix / hann_s:.2f} MPix/s)")


def profile_ops():
    """--profile-ops: where does the engine program's device time go?
    Ablation attribution (gather / model forward / crop+stitch) — each
    stage timed as its own jitted program on device-resident data, with
    the tunnel's 1-element readback floor reported for calibration.
    (A jax.profiler .xplane trace needs TensorBoard to read; ablation
    gives the same attribution and runs anywhere.)"""
    rng = np.random.default_rng(0)
    scene_u16 = rng.integers(0, 3000, (SCENE, SCENE, BANDS)).astype(np.uint16)
    model, variables = build_model()
    engine = make_engine(model, variables)
    half = BUFFER // 2
    side = KERNEL + BUFFER

    staged = jax.device_put(jnp.asarray(scene_u16))
    np.asarray(engine.predict_scene(staged))  # warm full program

    corners = np.asarray(
        [(y, x) for y in range(half, SCENE - side, KERNEL)
         for x in range(half, SCENE - side, KERNEL)], np.int32)
    n = len(corners)
    n_pad = (-n) % BATCH
    corners = np.concatenate([corners, np.repeat(corners[-1:], n_pad, 0)])

    def gather_only(scene):
        scene = (scene.astype(jnp.float32) / 10000.0)
        chips = jax.vmap(
            lambda yx: jax.lax.dynamic_slice(scene, (yx[0], yx[1], 0),
                                             (side, side, BANDS))
        )(jnp.asarray(corners))
        return chips.sum()  # force materialization

    def forward_only(chips):
        groups = chips.reshape(-1, BATCH, side, side, BANDS)
        preds = jnp.concatenate([
            model.apply(variables, groups[i])["probs"].astype(jnp.float32)
            for i in range(groups.shape[0])
        ])
        return preds.sum()

    chips_dev = jax.device_put(
        rng.normal(size=(len(corners), side, side, BANDS)).astype(np.float32))

    def t(fn, *args, reps=5):
        f = jax.jit(fn)
        np.asarray(f(*args))  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(f(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    floor = t(lambda s: s[0, 0, 0].astype(jnp.float32) * 2, staged)
    g = t(gather_only, staged)
    fwd = t(forward_only, chips_dev)
    # reduce the FULL output — a single-pixel probe lets XLA dead-code
    # the chips that don't cover it (measured 0.5 ms: the whole scene
    # program collapsed to nothing)
    full = t(lambda s: engine.predict_scene(s).astype(jnp.float32).sum(), staged)
    print(f"readback floor:        {floor*1e3:7.1f} ms")
    print(f"preprocess+gather:     {(g - floor)*1e3:7.1f} ms ({n} chips of {side}^2)")
    print(f"model forward (batched): {(fwd - floor)*1e3:5.1f} ms "
          f"({len(corners)} chips, groups of {BATCH})")
    print(f"full engine program:   {(full - floor)*1e3:7.1f} ms "
          f"(gather+forward+crop+stitch+uint8)")

    # whole-scene mode: no window overlap (the 256+128 chip grid
    # recomputes every buffer region, a (384/256)^2 = 2.25x FLOP tax),
    # no gather, no stitch — the device-resident fast path
    whole = TiledInferenceEngine(
        engine.predict_fn, kernel=KERNEL, buffer=BUFFER, batch_size=BATCH,
        out_channels=1, tile_mode="whole",
        preprocess_fn=engine.preprocess_fn,
        output_transform=engine.output_transform,
    )
    w = t(lambda s: whole.predict_scene(s).astype(jnp.float32).sum(), staged)
    print(f"whole-scene forward:   {(w - floor)*1e3:7.1f} ms "
          f"({SCENE}^2 single conv pass, no tiling)")


def probe_layout():
    """--probe-layout: NHWC vs NCHW conv layouts at the U-Net's
    whole-scene level shapes (VERDICT r2 asked; decision record in
    ROADMAP). Each timing is one jitted 2-conv stack, bf16, scalar
    readback."""
    import functools

    rng = np.random.default_rng(0)
    floor = _timed_scalar(
        jax.jit(lambda s: s[0, 0].astype(jnp.float32) * 2),
        jax.device_put(np.zeros((8, 8), np.float32)),
    )
    for h, cin, cout in [(1984, 4, 32), (1984, 32, 32), (992, 64, 64), (496, 128, 128)]:
        for layout in ("NHWC", "NCHW"):
            if layout == "NHWC":
                x = jnp.asarray(rng.normal(size=(1, h, h, cin)).astype(np.float32), jnp.bfloat16)
                k1 = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.1, jnp.bfloat16)
                k2 = jnp.asarray(rng.normal(size=(3, 3, cout, cout)) * 0.1, jnp.bfloat16)
                dn = ("NHWC", "HWIO", "NHWC")
            else:
                x = jnp.asarray(rng.normal(size=(1, cin, h, h)).astype(np.float32), jnp.bfloat16)
                k1 = jnp.asarray(rng.normal(size=(cout, cin, 3, 3)) * 0.1, jnp.bfloat16)
                k2 = jnp.asarray(rng.normal(size=(cout, cout, 3, 3)) * 0.1, jnp.bfloat16)
                dn = ("NCHW", "OIHW", "NCHW")

            conv = functools.partial(
                jax.lax.conv_general_dilated, window_strides=(1, 1),
                padding="SAME", dimension_numbers=dn,
            )

            def stack(x, k1=k1, k2=k2, conv=conv):
                y = jax.nn.relu(conv(x, k1))
                y = jax.nn.relu(conv(y, k2))
                return y.astype(jnp.float32).sum()

            t = _sub_floor(_timed_scalar(jax.jit(stack), x), floor)
            flops = 2 * 9 * h * h * (cin * cout + cout * cout)
            print(f"{h}^2 {cin}->{cout}->{cout} {layout}: {t*1e3:7.1f} ms "
                  f"({flops / t / PEAK_FLOPS * 100:.1f}% MFU)", flush=True)


def probe_s2d_conv():
    """--probe-s2dconv: is a parity-decomposed conv worth building?

    A stride-1 3x3 conv over (H, W, C) is mathematically equivalent to a
    2x2 conv over the (H/2, W/2, 4C) space-to-depth representation with
    rearranged weights (each output parity class sums shifted taps of
    the input parity classes). FLOPs rise 16/9 but MXU lane utilization
    rises 4x at C=32 — probe whether the trade wins on this chip before
    implementing the exact transform."""
    import functools

    rng = np.random.default_rng(0)
    floor = _timed_scalar(
        jax.jit(lambda s: s[0, 0].astype(jnp.float32) * 2),
        jax.device_put(np.zeros((8, 8), np.float32)),
    )
    cases = [
        ("3x3 1984^2 c32 (original L0)", (1, 1984, 1984, 32), (3, 3, 32, 32)),
        ("2x2 992^2 c128 (S2D form of L0)", (1, 992, 992, 128), (2, 2, 128, 128)),
        ("3x3 1984^2 c4->32 (stem)", (1, 1984, 1984, 4), (3, 3, 4, 32)),
        ("2x2 992^2 c16->128 (S2D stem)", (1, 992, 992, 16), (2, 2, 16, 128)),
        ("3x3 992^2 c64 (L1)", (1, 992, 992, 64), (3, 3, 64, 64)),
        ("2x2 496^2 c256 (S2D form of L1)", (1, 496, 496, 256), (2, 2, 256, 256)),
    ]
    conv = functools.partial(
        jax.lax.conv_general_dilated, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    for name, xshape, kshape in cases:
        x = jnp.asarray(rng.normal(size=xshape).astype(np.float32), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=kshape) * 0.1, jnp.bfloat16)
        f = jax.jit(lambda x, k=k: jax.nn.relu(conv(x, k)).astype(jnp.float32).sum())
        t = _sub_floor(_timed_scalar(f, x), floor)
        flops = (2 * kshape[0] * kshape[1] * kshape[2] * kshape[3]
                 * xshape[1] * xshape[2])
        print(f"{name}: {t*1e3:7.2f} ms ({flops / t / PEAK_FLOPS * 100:.1f}% MFU)",
              flush=True)


def probe_conv_batching():
    """--probe-batch: same total pixels, different batch/spatial splits —
    is the shallow-conv MFU shortfall a spatial-tiling artifact XLA
    handles better at smaller HW or rounder sizes?"""
    import functools

    rng = np.random.default_rng(0)
    floor = _timed_scalar(
        jax.jit(lambda s: s[0, 0].astype(jnp.float32) * 2),
        jax.device_put(np.zeros((8, 8), np.float32)),
    )
    conv = functools.partial(
        jax.lax.conv_general_dilated, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    cases = [
        ("b1 1984^2 c32", (1, 1984, 1984, 32)),
        ("b1 2048^2 c32", (1, 2048, 2048, 32)),
        ("b4 992^2 c32", (4, 992, 992, 32)),
        ("b16 496^2 c32", (16, 496, 496, 32)),
        ("b64 248^2 c32", (64, 248, 248, 32)),
        ("b16 496^2 c64", (16, 496, 496, 64)),
    ]
    for name, xshape in cases:
        x = jnp.asarray(rng.normal(size=xshape).astype(np.float32), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(3, 3, xshape[-1], xshape[-1])) * 0.1,
                        jnp.bfloat16)
        f = jax.jit(lambda x, k=k: jax.nn.relu(conv(x, k)).astype(jnp.float32).sum())
        t = _sub_floor(_timed_scalar(f, x), floor)
        flops = 2 * 9 * xshape[0] * xshape[1] * xshape[2] * xshape[3] * xshape[3]
        print(f"{name}: {t*1e3:7.2f} ms ({flops / t / PEAK_FLOPS * 100:.1f}% MFU)",
              flush=True)


def probe_train_geometry():
    """--probe-traingeo: the solar train step (same U-Net, same per-pixel
    loss) across batch/tile splits. The inference-side probes showed
    XLA's conv sweet spot near batch-16 x ~500^2; training tiles are a
    free preprocessing choice (data/chip_generators.py samples chips from
    the same scenes at any size), so if big tiles lift train MFU the
    recipe transfers. BN batch statistics average over N*H*W pixels
    either way — equal pixel budgets give equally-sampled stats."""
    from satellite_computervision_tpu.models.losses import weighted_bce
    from satellite_computervision_tpu.train.trainer import (
        create_train_state,
        make_train_step,
    )

    rng = np.random.default_rng(1)
    floor = _timed_scalar(
        jax.jit(lambda s: s[0, 0].astype(jnp.float32) * 2),
        jax.device_put(np.zeros((8, 8), np.float32)),
    )
    model = UNet(
        n_classes=1, filters=(32, 64, 128, 256, 512), factors=(2, 2, 2, 2, 2),
        head="sigmoid", dtype=jnp.bfloat16, bn_momentum=0.9,
    )
    cases = [  # (batch, tile): 1x and 4x the reference pixel budget
        (16, 256), (4, 512), (64, 256), (16, 512), (8, 512), (32, 384),
    ]
    for batch, tile in cases:
        x = jnp.asarray(rng.normal(size=(batch, tile, tile, 6)).astype(np.float32))
        y = jnp.asarray(
            (rng.uniform(size=(batch, tile, tile, 1)) > 0.8).astype(np.float32)
        )
        state = create_train_state(model, jax.random.key(0), x)
        step = make_train_step(
            lambda t, p: weighted_bce(t, p, pos_weight=2.0, logits=True),
            donate=False,
        )
        try:
            state, m = step(state, (x, y))
            np.asarray(m["loss"])  # compile + warm
            best = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                state, m = step(state, (x, y))
                np.asarray(m["loss"])
                best = min(best, time.perf_counter() - t0)
        except Exception as e:  # OOM at the big splits is a result too
            print(f"b{batch} {tile}^2: FAILED ({type(e).__name__})", flush=True)
            continue
        t = _sub_floor(best, floor)
        flops = _flops_of(step, state, (x, y))
        mpix = batch * tile * tile / t / 1e6
        print(f"b{batch} {tile}^2: {t*1e3:7.1f} ms  "
              f"{mpix:7.1f} MPix/s  ({flops / t / PEAK_FLOPS * 100:.1f}% MFU)",
              flush=True)


def probe_ref_device():
    """--probe-ref-device: pin down the reference pattern's DEVICE cost
    (batch-1 float32 per-chip forwards, utils/prediction_tools.py:133-156)
    three ways, to pick an honest `ref_device_ms` for the JSON:

    a) one jitted program of R unrolled batch-1 forwards (pure compute,
       floor paid once — the per-chip readback floor on this relay dwarfs
       a single 384^2 forward, so single-chip timing is noise);
    b) 36 separate batch-1 programs dispatched back-to-back with ONE
       final sync (their per-program launch pattern with the wire
       overlapped — the device still executes 36 small programs);
    c) the same 36 dispatches with a per-chip host sync — the loop as the
       reference actually runs it (wire-dominated here; for context).
    """
    rng = np.random.default_rng(0)
    scene = rng.integers(0, 3000, (SCENE, SCENE, BANDS)).astype(np.uint16)
    model, _variables = build_model()
    variables = _variables
    staged = jax.device_put(jnp.asarray(scene))
    floor_fn = jax.jit(lambda s: s[0, 0, 0].astype(jnp.float32) * 2)
    floor = _timed_scalar(floor_fn, staged)
    print(f"readback floor: {floor*1e3:.1f} ms", flush=True)

    f32_model = UNet(
        n_classes=1, filters=(32, 64, 128, 256, 512), factors=(2, 2, 2, 2, 2),
        head="sigmoid", dtype=jnp.float32,
    )
    idx = generate_chip_indices(SCENE, SCENE, KERNEL, BUFFER, mode="reference")
    side = KERNEL + BUFFER
    half = BUFFER // 2
    n = len(idx)

    # (a) unrolled R-chip program: per-chip pure compute
    R = 6
    scene_f = jnp.asarray(scene.astype(np.float32) / 10000.0)
    chips6 = jnp.stack([
        scene_f[y - half : y + KERNEL + half, x - half : x + KERNEL + half]
        for (y, x) in idx[:R]
    ])

    def six(chips):
        acc = jnp.float32(0)
        for i in range(R):
            acc += f32_model.apply(variables, chips[i][None])["probs"] \
                .astype(jnp.float32).sum()
        return acc

    j6 = jax.jit(six)
    t6 = _sub_floor(_timed_scalar(j6, chips6), floor)
    flops6 = _flops_of(j6, chips6)
    per_chip = t6 / R
    print(f"(a) {R}-chip unrolled: {t6*1e3:.1f} ms -> {per_chip*1e3:.2f} "
          f"ms/chip ({flops6 / t6 / PEAK_FLOPS * 100:.1f}% of bf16 peak), "
          f"x{n} = {per_chip*n*1e3:.1f} ms", flush=True)

    # (b) 36 programs, async dispatch, one sync
    ref1 = jax.jit(lambda c: f32_model.apply(variables, c[None])["probs"])
    chips_all = [
        scene_f[y - half : y + KERNEL + half, x - half : x + KERNEL + half]
        for (y, x) in idx
    ]
    chips_dev = [jax.device_put(c) for c in chips_all]
    outs = [ref1(c) for c in chips_dev]  # warm once
    np.asarray(outs[-1].sum())
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [ref1(c) for c in chips_dev]
        np.asarray(sum(o.sum() for o in outs))
        best = min(best, time.perf_counter() - t0)
    tb = _sub_floor(best, floor)
    print(f"(b) 36 async programs + 1 sync: {tb*1e3:.1f} ms", flush=True)

    # (c) per-chip sync (the reference's actual loop; wire-bound here)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for c in chips_dev:
            np.asarray(ref1(c))
        best = min(best, time.perf_counter() - t0)
    print(f"(c) 36 sync round trips: {best*1e3:.1f} ms", flush=True)


def device_metrics_only():
    """--device-metrics: just the device-resident fields (for controlled
    reruns; keep the host otherwise idle — 1-core box, any concurrent
    process skews even scalar-readback timings)."""
    rng = np.random.default_rng(0)
    scene = rng.integers(0, 3000, (SCENE, SCENE, BANDS)).astype(np.uint16)
    model, variables = build_model()
    staged = jax.device_put(jnp.asarray(scene))
    ctx = {}
    stage_device_ratios(model, variables, staged, ctx)
    stage_train(ctx)
    stage_extras(model, variables, staged, ctx)
    emit()


if __name__ == "__main__":
    if "--device-metrics" in sys.argv:
        device_metrics_only()
        sys.exit(0)
    if "--swath" in sys.argv:
        from examples.swath_codec_sweep import main as swath_main

        sys.exit(swath_main(sys.argv[sys.argv.index("--swath") + 1:]))
    if "--probe-ref-device" in sys.argv:
        probe_ref_device()
        sys.exit(0)
    if "--probe-layout" in sys.argv:
        probe_layout()
        sys.exit(0)
    if "--probe-s2dconv" in sys.argv:
        probe_s2d_conv()
        sys.exit(0)
    if "--probe-batch" in sys.argv:
        probe_conv_batching()
        sys.exit(0)
    if "--probe-traingeo" in sys.argv:
        probe_train_geometry()
        sys.exit(0)
    if "--overlap" in sys.argv:
        overlap_experiment()
        sys.exit(0)
    if "--profile" in sys.argv:
        profile_components()
        sys.exit(0)
    if "--profile-ops" in sys.argv:
        profile_ops()
        sys.exit(0)
    sys.exit(main())
