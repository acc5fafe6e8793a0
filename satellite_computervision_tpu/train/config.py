"""Typed workload configs replacing the reference's notebook-global config.

The reference configures runs via module-level constants in notebook cells
(BANDS/RESPONSE/KERNEL_SIZE/BATCH_SIZE/EPOCHS/..., solar notebook cell 17,
parking cell 16). Presets below carry those exact values.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    name: str
    bands: Sequence[str]
    response: str
    kernel_size: int
    kernel_buffer: int
    batch_size: int
    epochs: int
    learning_rate: float
    train_size: int
    eval_size: int
    shuffle_buffer: int
    loss: str
    loss_kwargs: Dict = dataclasses.field(default_factory=dict)
    num_classes: int = 1
    threshold: float = 0.5
    monitor: str = "mean_iou"
    one_hot: Optional[Dict[str, int]] = None
    axes: Tuple[int, ...] = (2,)
    splits: Optional[Sequence[int]] = None
    # model family key in train.zoo.FAMILIES
    family: str = "unet"
    # timeseries length for the ConvLSTM families (SURVEY §5: T ~= 6)
    n_time: int = 6
    # Measured SERVING geometry (chip kernel/buffer/batch for inference).
    # The reference hard-codes the training chip size into its predict
    # loop (utils/prediction_tools.py:87-131, the 256+128 constant it
    # never questions); geometry is a pure serving choice for a fully
    # convolutional model, and the measured winner differs from the
    # training geometry (inference/tune.py). None = fall back to the
    # training kernel/buffer/batch.
    serve_kernel: Optional[int] = None
    serve_buffer: Optional[int] = None
    serve_batch: Optional[int] = None
    # Measured TRAINING geometry. train_batch applies to EVERY training
    # path (batch needs no chip re-cut); train_tile only to generator-fed
    # training, where chip size is a free preprocessing choice
    # (data/chip_generators.py cuts from larger arrays at any size — the
    # reference's 256^2 is just its export format) — TFRecord-fed
    # training keeps kernel_size (serialized chips can't be re-cut).
    # bench.py --probe-traingeo measures the MXU-efficient split.
    train_tile: Optional[int] = None
    train_batch: Optional[int] = None
    # Space-to-depth stem for from-scratch U-Net training (models/unet.py):
    # folds 2x2 pixels into channels before the trunk, quadrupling MXU lane
    # occupancy at the shallow full-resolution levels — the measured
    # lane-bound fix (ROADMAP "Conv layout" probe). Quality verified at the
    # full config (runs/solar_convergence_s2d.jsonl IoU 0.9950 vs 0.9947
    # plain; s2d_b64 0.9938). NOT reference-weight-compatible: .h5 import
    # and --torch-weights paths always build the plain stem regardless of
    # this flag (train/keras_import.py infers arch from the weights).
    space_to_depth: bool = False

    @property
    def serving_geometry(self) -> Tuple[int, int, int]:
        """(kernel, buffer, batch) the predict CLI serves by default."""
        return (
            self.serve_kernel or self.kernel_size,
            self.serve_buffer if self.serve_buffer is not None else self.kernel_buffer,
            self.serve_batch or self.batch_size,
        )

    @property
    def training_geometry(self) -> Tuple[int, int]:
        """(tile, batch) for generator-fed training: the measured MXU
        winner when one exists, else the reference chip config."""
        return (
            self.train_tile or self.kernel_size,
            self.train_batch or self.batch_size,
        )

    @property
    def steps_per_epoch(self) -> int:
        return self.train_size // self.batch_size

    @property
    def eval_steps(self) -> int:
        return self.eval_size


# Solar-array U-Net on Sentinel-2 (solar notebook cell 17; threshold 0.9
# per utils/model_tools.py:444-445).
SOLAR_CONFIG = TrainConfig(
    name="solar",
    bands=("B2", "B3", "B4", "B8", "B11", "B12"),
    response="landcover",
    kernel_size=256,
    kernel_buffer=128,
    batch_size=16,
    epochs=20,
    learning_rate=9e-4,
    train_size=7700,
    eval_size=3300,
    shuffle_buffer=11000,
    loss="weighted_bce",
    loss_kwargs={"pos_weight": 1.0},
    num_classes=1,
    threshold=0.9,
    # measured on v5e (bench.py hann_tuned_ms / inference/tune.py): the
    # k512+b128 batch-16 hann grid serves solar-class 1920^2 scenes ~2x
    # faster on-device than the k256 training geometry
    serve_kernel=512,
    serve_buffer=128,
    serve_batch=16,
    # measured TRAIN geometry (bench.py --probe-traingeo, v5e): batch 64
    # at the same 256^2 tile = 17.4% MFU / 25.7 MPix/s vs batch-16's
    # 12.1% / 17.9 — and bigger tiles LOSE at equal batch (b16 512^2 =
    # 14.1%, b4 512^2 = 6.7%). Batch applies to TFRecord-fed training
    # too; tile stays the export size. Quality at batch 64 verified in
    # runs/solar_convergence_b64.jsonl.
    train_batch=64,
    # from-scratch default as of round 5: S2D+b64 is the measured fastest
    # quality-proven training recipe (runs/solar_convergence_s2d_b64.jsonl
    # IoU 0.9938 at saturation; bench.py train_mpix_s2d_b64). Flip off via
    # --no-s2d (scripts/train.py) when the checkpoint must stay
    # reference-weight-compatible.
    space_to_depth=True,
)

# Parking-lot model on NAIP RGB (parking notebook cells 16, 39, 58).
PARKING_CONFIG = TrainConfig(
    name="parking",
    bands=("R", "G", "B"),
    response="impervious",
    kernel_size=512,
    kernel_buffer=256,
    batch_size=16,
    epochs=50,
    learning_rate=9e-4,
    train_size=8000,
    eval_size=5000,
    shuffle_buffer=8000,
    loss="weighted_bce",
    loss_kwargs={"pos_weight": 20.0},
    num_classes=1,
    threshold=0.5,
)


# Sentinel-2 before/after change detection with the Siamese U-Net
# (make_siamese_unet utils/model_tools.py:638-663; chips fed by
# SiameseDataGenerator utils/processing.py:757-892, /10000 divisor,
# binary any-class>1 labels; scene assembly = run_local's 4-band pairs,
# utils/pc_tools.py:620-654).
CHANGE_CONFIG = TrainConfig(
    name="change",
    bands=("B02", "B03", "B04", "B08"),
    response="change",
    kernel_size=256,
    kernel_buffer=128,
    batch_size=8,
    epochs=20,
    learning_rate=9e-4,
    train_size=4000,
    eval_size=1000,
    shuffle_buffer=4000,
    loss="weighted_bce",
    loss_kwargs={"pos_weight": 4.0},
    num_classes=1,
    threshold=0.5,
    family="siamese",
)

# ConvLSTM next-step timeseries regression (get_lstm_model
# utils/model_tools.py:773-808; LSTMDataGenerator utils/processing.py:
# 895-972: (T, C, H, W) npy series, /10000, random sequence rotation).
TIMESERIES_CONFIG = TrainConfig(
    name="timeseries",
    bands=("B02", "B03", "B04", "B08"),
    response="next",
    kernel_size=64,
    kernel_buffer=32,
    batch_size=16,
    epochs=20,
    learning_rate=9e-4,
    train_size=2000,
    eval_size=500,
    shuffle_buffer=2000,
    loss="mse_4d",
    num_classes=4,
    monitor="loss",
    family="convlstm",
    n_time=6,
)

# Hierarchical landcover (hybrid / ACNN / hierarchical families; 8 classes
# = get_hybrid_model's default, utils/model_tools.py:874-920; chips from
# HybridDataGenerator utils/processing.py:1051-1184).
LANDCOVER_CONFIG = TrainConfig(
    name="landcover",
    bands=("R", "G", "B", "N"),
    response="lc",
    kernel_size=256,
    kernel_buffer=128,
    batch_size=8,
    epochs=30,
    learning_rate=9e-4,
    train_size=4000,
    eval_size=1000,
    shuffle_buffer=4000,
    loss="weighted_categorical_crossentropy",
    num_classes=8,
    monitor="mean_iou",
    family="hybrid",
    n_time=6,
)

# Wetland mapping (README capability; the reference's azure/
# train_wetland.py driver is absent from its snapshot —
# .spyproject/workspace.ini:9 references it). Reconstructed from the data
# the reference's pipeline assembles for it: S1+S2 timeseries through the
# ConvLSTM branch and DEM/HAG/SSURGO terrain-soil planes through the
# U-Net branch of the hybrid model (UNETDataGenerator sources,
# utils/processing.py:601-650; get_hag/get_ssurgo_stac,
# utils/pc_tools.py:224-262, :496-562), binary wetland response.
WETLAND_CONFIG = TrainConfig(
    name="wetland",
    bands=("VV", "VH", "B02", "B03", "B04", "B08"),
    response="wetland",
    kernel_size=256,
    kernel_buffer=128,
    batch_size=8,
    epochs=30,
    learning_rate=9e-4,
    train_size=4000,
    eval_size=1000,
    shuffle_buffer=4000,
    loss="weighted_categorical_crossentropy",
    num_classes=2,  # not-wetland / wetland via the hybrid's softmax head
    threshold=0.5,
    family="hybrid",
    n_time=6,
)

CONFIGS = {
    "solar": SOLAR_CONFIG,
    "parking": PARKING_CONFIG,
    "change": CHANGE_CONFIG,
    "timeseries": TIMESERIES_CONFIG,
    "landcover": LANDCOVER_CONFIG,
    "wetland": WETLAND_CONFIG,
}
