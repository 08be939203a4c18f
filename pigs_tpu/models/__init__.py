from pigs_tpu.models.state import MixtureState, init_state, covariance_of, prune, split
from pigs_tpu.models.dynamics import DynamicsNetwork, Deltas
from pigs_tpu.models.model import (LossWeights, ModelConfig, StepFields, Losses,
                                   make_initial_state, randomize_state,
                                   sample_fields, forward_step, compute_loss,
                                   adaptive_split, make_network)

__all__ = [
    "MixtureState", "init_state", "covariance_of", "prune", "split",
    "DynamicsNetwork", "Deltas",
    "LossWeights", "ModelConfig", "StepFields", "Losses",
    "make_initial_state", "randomize_state", "sample_fields", "forward_step",
    "compute_loss", "adaptive_split", "make_network",
]
