"""Multi-device SPMD tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from split_vae_tpu.core.config import VaeConfig
from split_vae_tpu.core.state import create_train_state
from split_vae_tpu.models.vae import LGVae
from split_vae_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    infer_param_sharding,
    shard_state,
)
from split_vae_tpu.train.steps import make_vae_train_step


def test_mesh_shapes():
    mesh = create_mesh()
    assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1
    mesh = create_mesh(num_data=4, num_model=2)
    assert mesh.shape["data"] == 4 and mesh.shape["model"] == 2


def test_data_parallel_train_step_runs_sharded():
    mesh = create_mesh(num_data=8)
    config = VaeConfig(model="lgvae", batch_size=16, patch_size=2, beta=1.0,
                       global_latent_dims=8, local_latent_dims=8)
    model = LGVae(8, 8, (16, 16))
    state = create_train_state(model, jnp.zeros((16, 16, 16, 6)), optax.adam(1e-4))
    state = shard_state(state, mesh)
    step = make_vae_train_step(config)
    batch = jax.device_put(
        np.random.RandomState(0).randint(0, 255, (16, 16, 16, 3), np.uint8),
        batch_sharding(mesh))
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["total_loss"]))
    # params stay replicated across the data axis
    leaf = jax.tree.leaves(state.params)[0]
    assert len(leaf.sharding.device_set) in (1, 8)


def test_data_parallel_matches_single_device():
    """Same batch, same seed: sharded and unsharded updates must agree."""
    config = VaeConfig(model="lgvae", batch_size=16, patch_size=2, beta=1.0)
    model = LGVae(8, 8, (16, 16))
    step = make_vae_train_step(config)
    batch_np = np.random.RandomState(0).randint(0, 255, (16, 16, 16, 3), np.uint8)

    state1 = create_train_state(model, jnp.zeros((16, 16, 16, 6)), optax.adam(1e-4), seed=3)
    state1, m1 = step(state1, jnp.asarray(batch_np))

    mesh = create_mesh(num_data=8)
    state2 = create_train_state(model, jnp.zeros((16, 16, 16, 6)), optax.adam(1e-4), seed=3)
    state2 = shard_state(state2, mesh)
    batch = jax.device_put(batch_np, batch_sharding(mesh))
    state2, m2 = step(state2, batch)

    np.testing.assert_allclose(float(m1["total_loss"]), float(m2["total_loss"]), rtol=1e-4)
    p1 = jax.tree.leaves(state1.params)[0]
    p2 = jax.tree.leaves(state2.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-5)


def test_model_axis_sharding_rule():
    mesh = create_mesh(num_data=4, num_model=2)
    params = {
        "big": jnp.zeros((512, 512)),    # sharded (>= min_size, divisible)
        "small": jnp.zeros((4, 4)),      # replicated (too small)
        "vec": jnp.zeros((512,)),        # replicated (ndim < 2)
    }
    shardings = infer_param_sharding(params, mesh)
    assert shardings["big"].spec == jax.sharding.PartitionSpec(None, "model")
    assert shardings["small"].spec == jax.sharding.PartitionSpec()
    assert shardings["vec"].spec == jax.sharding.PartitionSpec()


def test_dryrun_multichip_entrypoint():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.x_mean.shape == (8, 64, 64, 3)
