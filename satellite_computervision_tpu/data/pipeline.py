"""TFRecord chip datasets with fused on-device preprocessing.

Reference pipeline: parse_tfrecord -> to_tuple (derived bands, one-hot,
stack HWC, color aug, rescale, morph aug, split) -> shuffle/batch/repeat
(utils/processing.py:335-454). The reference runs to_tuple per example on
host CPU threads; here parsing stays host-side but everything numeric runs
as ONE jitted, vmapped XLA program on already-batched device arrays — the
fused preprocessing path of BASELINE.json's north star.

Layout: host threads read + parse TFRecords into pinned NumPy batches; a
double-buffered prefetcher overlaps `jax.device_put` + preprocess with the
train step (the tf.data `num_parallel_calls=5` equivalent).
"""

from __future__ import annotations

import functools
import queue
import random
import threading
from typing import Callable, Dict, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from satellite_computervision_tpu.ops.augment import aug_color, aug_morph
from satellite_computervision_tpu.ops.classes import one_hot as one_hot_encode
from satellite_computervision_tpu.ops.normalize import rescale_image


class ChipDataset:
    """Iterates (K, K)-shaped feature dicts from EE-exported TFRecords.

    ``feature_names`` lists every band stored per example (features +
    response, the EE export schema of fixed-length float lists,
    utils/processing.py:394-419); each is reshaped to ``(kernel, kernel)``.

    ``workers > 1`` decodes files on a thread pool (the tf.data
    ``num_parallel_calls=5`` analog, utils/processing.py:417): gzip and
    the native codec release the GIL, so decode overlaps across files and
    with the training step. Files complete out of order — acceptable
    because training shuffles anyway; keep ``workers=1`` for deterministic
    order.
    """

    def __init__(
        self,
        files: Sequence[str],
        feature_names: Sequence[str],
        kernel_size: int = 256,
        compression: Optional[str] = "GZIP",
        workers: int = 1,
    ):
        self.files = list(files)
        self.feature_names = list(feature_names)
        self.kernel_size = kernel_size
        self.compression = compression
        self.workers = workers

    def _read_file(self, path):
        from satellite_computervision_tpu.data.tfrecord import read_float_examples

        k = self.kernel_size
        return [
            {name: arr.reshape(k, k) for name, arr in row.items()}
            for row in read_float_examples(path, self.feature_names, self.compression)
        ]

    def __iter__(self):
        if self.workers <= 1 or len(self.files) <= 1:
            for path in self.files:
                yield from self._read_file(path)
            return
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(self.workers) as pool:
            # bounded in-flight window preserves memory while overlapping
            pending = []
            files = iter(self.files)
            for path in files:
                pending.append(pool.submit(self._read_file, path))
                if len(pending) >= self.workers:
                    break
            while pending:
                done = pending.pop(0)
                nxt = next(files, None)
                if nxt is not None:
                    pending.append(pool.submit(self._read_file, nxt))
                yield from done.result()


def make_preprocess_fn(
    features: Sequence[str],
    response: str,
    axes: Sequence[int] = (2,),
    splits=None,
    moments=None,
    one_hot: Optional[Dict[str, int]] = None,
    response_depth: Optional[int] = None,
    derived: Optional[Dict[str, Callable]] = None,
    augment: bool = True,
) -> Callable:
    """Build the jitted batch-preprocess: dict of (B, K, K) bands -> (x, y).

    Mirrors to_tuple (utils/processing.py:335-392) element-for-element:
    derived bands, one-hot response (``response_depth``) or expand-dims,
    continuous band stack -> color aug -> rescale, concat one-hot feature
    bands + response, joint morph aug, split, clip labels to <= 1.
    ``augment=False`` drops both random augs (the reference's to_tuple
    augments eval batches too — opt back in by leaving it True).
    """
    one_hot = one_hot or {}
    derived = derived or {}
    continuous = [f for f in features if f not in one_hot]

    @functools.partial(jax.jit, static_argnames=("train",))
    def preprocess(batch: Dict[str, jnp.ndarray], key, train: bool = True):
        # accept reduced-precision staged batches (TrainIterator
        # stage_dtype=float16 halves H2D bytes); all math runs in f32
        batch = {k: v.astype(jnp.float32) for k, v in batch.items()}
        for name, fn in derived.items():
            batch[name] = fn(batch)

        if response_depth is not None:
            res = one_hot_encode(batch[response], response_depth)
        else:
            res = batch[response][..., None]

        bands = jnp.stack([batch[f] for f in continuous], axis=-1)  # (B,K,K,C)
        bsz = bands.shape[0]
        keys = jax.random.split(key, bsz * 2).reshape(bsz, 2)

        if augment and train:
            bands = jax.vmap(aug_color)(keys[:, 0], bands)
        bands = jax.vmap(
            lambda b: rescale_image(b, axes=axes, moments=moments, splits=splits)
        )(bands)

        pieces = [bands]
        for name, depth in one_hot.items():
            if name in features:
                pieces.append(one_hot_encode(batch[name], depth))
        pieces.append(res)
        stacked = jnp.concatenate(pieces, axis=-1)

        if augment and train:
            stacked = jax.vmap(aug_morph)(keys[:, 1], stacked)

        n_res = res.shape[-1]
        feats = stacked[..., :-n_res]
        labels = jnp.minimum(stacked[..., -n_res:], 1.0)
        return feats, labels

    return preprocess


def _batched(iterator, batch_size: int, feature_names, drop_remainder=False):
    """Batch a dict-example stream. By default the final partial batch is
    kept — tf.data ``.batch`` semantics (utils/processing.py:438-454);
    dropping the tail would silently exclude up to batch_size-1 examples
    from eval metrics (and from checkpoint-best decisions). Repeating
    training streams pass ``drop_remainder=True`` so every step keeps one
    static shape (no per-epoch recompile of the jitted train step)."""
    buf = []
    for ex in iterator:
        buf.append(ex)
        if len(buf) == batch_size:
            yield {
                name: np.stack([b[name] for b in buf]) for name in feature_names
            }
            buf = []
    if buf and not drop_remainder:
        yield {name: np.stack([b[name] for b in buf]) for name in feature_names}


def _shuffled(iterator, buffer_size: int, rng: random.Random):
    """Reservoir-style shuffle buffer (tf.data .shuffle equivalent)."""
    buf = []
    for ex in iterator:
        buf.append(ex)
        if len(buf) >= buffer_size:
            i = rng.randrange(len(buf))
            buf[i], buf[-1] = buf[-1], buf[i]
            yield buf.pop()
    rng.shuffle(buf)
    yield from buf


def prefetch_to_device(iterator, size: int = 2, device=None):
    """Background-thread prefetcher: overlaps host IO/parse + H2D transfer
    with device compute (double-buffered for ``size=2``).

    Worker errors propagate to the consumer (re-raised from the generator)
    instead of silently truncating the stream. If the consumer abandons
    the generator early while the source still has items, the daemon
    thread stays blocked holding at most ``size`` staged items — iterate
    the generator to exhaustion (even discarding values) to release it."""
    q: "queue.Queue" = queue.Queue(maxsize=size)
    _END = object()
    _ERR = object()

    def worker():
        try:
            for item in iterator:
                q.put(jax.device_put(item, device))
        except BaseException as e:  # propagate, don't truncate
            q.put((_ERR, e))
        else:
            q.put(_END)

    thread = threading.Thread(target=worker, daemon=True)
    thread.start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, tuple) and len(item) == 2 and item[0] is _ERR:
            raise item[1]
        yield item


class TrainIterator:
    """Shuffled, batched, optionally repeating device-batch stream.

    Equivalent of get_training_dataset (utils/processing.py:421-441):
    shuffle(buffer) -> batch(batch_size) -> repeat.
    """

    def __init__(
        self,
        dataset: ChipDataset,
        batch_size: int = 16,
        shuffle_buffer: int = 1024,
        repeat: bool = True,
        seed: int = 0,
        prefetch: int = 2,
        drop_remainder: Optional[bool] = None,
        stage_dtype=None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle_buffer = shuffle_buffer
        self.repeat = repeat
        self.seed = seed
        self.prefetch = prefetch
        # Optional H2D staging dtype (e.g. np.float16): batches cross the
        # host->device link at half the bytes — usually the training
        # bottleneck on bandwidth-starved links — and the jitted preprocess
        # casts back to f32 on device. Sentinel-2 DNs (<= ~16k) fit f16 with
        # ~1e-3 relative rounding, far below sensor noise; default None
        # keeps exact f32 staging (the TF-parity configuration).
        self.stage_dtype = stage_dtype
        # repeating (training) streams default to static shapes; single-pass
        # (eval) streams keep the tail batch
        self.drop_remainder = repeat if drop_remainder is None else drop_remainder

    def _epochs(self):
        epoch = 0
        while True:
            rng = random.Random(self.seed + epoch)
            it = iter(self.dataset)
            if self.shuffle_buffer > 1:
                it = _shuffled(it, self.shuffle_buffer, rng)
            batches = _batched(it, self.batch_size, self.dataset.feature_names,
                               self.drop_remainder)
            if self.stage_dtype is not None:
                dt = self.stage_dtype
                batches = (
                    {name: arr.astype(dt) for name, arr in b.items()} for b in batches
                )
            yield from batches
            epoch += 1
            if not self.repeat:
                return

    def __iter__(self):
        return prefetch_to_device(self._epochs(), self.prefetch)


def get_training_dataset(
    files,
    feature_names,
    kernel_size: int = 256,
    batch_size: int = 16,
    shuffle_buffer: int = 1024,
    repeat: bool = True,
    seed: int = 0,
    compression: Optional[str] = "GZIP",
    workers: int = 2,
    stage_dtype=None,
) -> TrainIterator:
    ds = ChipDataset(files, feature_names, kernel_size, compression, workers=workers)
    return TrainIterator(ds, batch_size, shuffle_buffer, repeat, seed,
                         stage_dtype=stage_dtype)


def get_eval_dataset(
    files,
    feature_names,
    kernel_size: int = 256,
    batch_size: int = 1,
    compression: Optional[str] = "GZIP",
) -> TrainIterator:
    """Unshuffled, single-pass (utils/processing.py:443-454 batches eval at 1)."""
    ds = ChipDataset(files, feature_names, kernel_size, compression)
    return TrainIterator(ds, batch_size, shuffle_buffer=0, repeat=False)
