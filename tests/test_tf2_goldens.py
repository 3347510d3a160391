"""TF2 parity harness consistency: the layer maps cover the exported params.

The verify half (tools/tf2_goldens.py verify) needs tensorflow and runs
elsewhere; what CI can pin is that the our-name -> reference-attr weight maps
stay in exact 1:1 correspondence with the parameter trees the export half
dumps — so a refactor that renames/adds a flax module fails here instead of
on the TF2 machine.
"""

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo/tools")


def _flat_names(params, prefix=""):
    out = set()
    if isinstance(params, dict):
        for k in params:
            out |= _flat_names(params[k], f"{prefix}/{k}")
        return out
    out.add(prefix)
    return out


def test_vae_layer_map_matches_param_tree():
    from tf2_goldens import _VAE_LAYER_MAP

    from split_vae_tpu.models.vae import LGVae

    model = LGVae(128, 128, (32, 32))
    v = model.init({"params": jax.random.PRNGKey(0),
                    "sample": jax.random.PRNGKey(1)},
                   jnp.zeros((1, 32, 32, 6)))
    names = _flat_names(v["params"])
    covered = {f"/{ours}/{leaf}" for ours in _VAE_LAYER_MAP
               for leaf in ("kernel", "bias")}
    assert names == covered, (sorted(names - covered),
                              sorted(covered - names))


def test_spair_layer_map_matches_param_tree():
    from tf2_goldens import _SPAIR_LAYER_MAP

    from split_vae_tpu.core.config import SpairConfig
    from split_vae_tpu.models.spair import get_spair_model

    cfg = SpairConfig(model="lg_spair", split_z_l=True, concat_z_what=True,
                      dense_bg=True, dense_local=True, fused_render=False)
    cfg.image_size = (48, 48, 3)
    model = get_spair_model(cfg)
    v = model.init({"params": jax.random.PRNGKey(0),
                    "sample": jax.random.PRNGKey(1)},
                   jnp.zeros((1, 48, 48, 6)), True)
    names = _flat_names(v["params"])
    covered = {f"/{ours}/{leaf}" for ours in _SPAIR_LAYER_MAP
               for leaf in ("kernel", "bias")}
    assert names == covered, (sorted(names - covered),
                              sorted(covered - names))
