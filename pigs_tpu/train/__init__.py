from pigs_tpu.train.no_mlp import NoMLPConfig, RawParams, solve, solve_timestep
from pigs_tpu.train.pn import TrainConfig, train, train_epoch, rollout

__all__ = [
    "NoMLPConfig", "RawParams", "solve", "solve_timestep",
    "TrainConfig", "train", "train_epoch", "rollout",
]
