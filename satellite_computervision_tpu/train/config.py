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
