"""SPLIT model families."""

from split_vae_tpu.models.vae import LGVae, LGGMVae, GMVae, LGVaeOutput, GMVaeOutput, LGGMVaeOutput
from split_vae_tpu.models.spair import (
    SPAIR,
    LGSPAIR,
    LGGlimpseSPAIR,
    SpairOutput,
    get_spair_model,
)
from split_vae_tpu.nn.classifier import Classifier
