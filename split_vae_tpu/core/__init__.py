"""Core: configs, train state, checkpointing, metrics, logging."""

from split_vae_tpu.core.config import VaeConfig, SpairConfig, ClassifierConfig
from split_vae_tpu.core.state import TrainState, create_train_state
