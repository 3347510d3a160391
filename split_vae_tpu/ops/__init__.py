"""Numerical primitives: distributions/losses, STN, patch ops, count prior."""

from split_vae_tpu.ops.distributions import (
    gaussian_kl,
    gaussian_kl_two,
    gaussian_kl_safe,
    gaussian_kl_two_safe,
    discretized_logistic_nll,
    categorical_kl_uniform,
    gumbel_softmax,
    concrete_binary_pre_sigmoid_sample,
    concrete_binary_sample_kl,
    reparameterize,
    safe_log,
    bernoulli_xent,
    mean_sum,
)
from split_vae_tpu.ops.stn import stn_crop, stn_paste, zwhere_to_params, zwhere_to_bbox
from split_vae_tpu.ops.patches import (
    patch_scramble,
    batched_scramble,
    mix_scramble,
    gaussian_blur,
    high_low_pass,
    augment_batch,
)
from split_vae_tpu.ops.count_prior import z_pres_count_kl
