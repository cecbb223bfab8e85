from nerf_mae_tpu.train.optim import make_optimizer
from nerf_mae_tpu.train.trainer import MAETrainer, TrainState

__all__ = ["make_optimizer", "MAETrainer", "TrainState"]
