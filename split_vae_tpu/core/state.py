"""Training state: params + optimizer state + step + PRNG key, one pytree.

Replaces the reference's implicit Keras/optimizer state (vae/trainer.py:137-138,
spair/trainer.py:226-227) with an explicit, donate-able pytree so the jitted
update step runs fully in-place on device.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

Array = jax.Array


@flax.struct.dataclass
class TrainState:
    step: Array
    params: Any
    opt_state: Any
    rng: Array
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    apply_fn: Callable = flax.struct.field(pytree_node=False)
    batch_stats: Optional[Any] = None  # only the classifier has BatchNorm

    def apply_gradients(self, grads) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params, opt_state=new_opt_state)

    def next_rng(self, num: int = 1):
        """Split the carried key; returns (new_state, key or keys)."""
        keys = jax.random.split(self.rng, num + 1)
        new_state = self.replace(rng=keys[0])
        if num == 1:
            return new_state, keys[1]
        return new_state, keys[1:]


def create_train_state(
    model,
    sample_input: Array,
    tx: optax.GradientTransformation,
    seed: int = 0,
    training_kwargs: Optional[dict] = None,
) -> TrainState:
    """Initialize model variables with a dummy forward (like the reference's
    build-by-dummy-call, vae/main.py:74) and wrap them in a TrainState."""
    root = jax.random.PRNGKey(seed)
    init_key, sample_key, dropout_key, state_key = jax.random.split(root, 4)
    variables = model.init(
        {"params": init_key, "sample": sample_key, "dropout": dropout_key},
        sample_input,
        **(training_kwargs or {}),
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats")
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        rng=state_key,
        tx=tx,
        apply_fn=model.apply,
        batch_stats=batch_stats,
    )
