"""Training: jitted train/eval steps, loops, metrics, checkpoint/resume.

Reference: Keras ``fit`` + ModelCheckpoint(best val_mean_io_u) + retrain
flow (solar notebook cells 61-69; utils/model_tools.py:1128-1176).
"""

from satellite_computervision_tpu.train.trainer import (
    TrainState,
    create_train_state,
    make_train_step,
    make_eval_step,
    Trainer,
)
from satellite_computervision_tpu.train.checkpoint import (
    CheckpointManager,
    save_checkpoint,
    load_checkpoint,
)
from satellite_computervision_tpu.train.config import (
    TrainConfig,
    SOLAR_CONFIG,
    PARKING_CONFIG,
)

__all__ = [
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
    "Trainer",
    "CheckpointManager",
    "save_checkpoint",
    "load_checkpoint",
    "TrainConfig",
    "SOLAR_CONFIG",
    "PARKING_CONFIG",
]
