from .train_step import TrainStep, make_optimizer_labels
from .trainer import run

__all__ = ["TrainStep", "make_optimizer_labels", "run"]
