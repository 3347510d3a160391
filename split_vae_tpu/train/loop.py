"""Training loops for the VAE and SPAIR workloads.

Orchestration mirrors the reference trainers (vae/trainer.py:72-421,
spair/trainer.py:112-424): infinite train iterator, periodic full-test-set
evaluation with probes and PNG artifacts, final weights export — plus the
framework upgrades the reference lacks: periodic full-state checkpointing with
--resume, JSONL metrics, honest imgs/sec timing, device prefetch, and
data-parallel execution over a device mesh.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from split_vae_tpu.core import checkpoint as ckpt
from split_vae_tpu.core.logging import RunLogger, StepTimer, make_run_dir, maybe_profile
from split_vae_tpu.core.metrics import MeanMetrics, linear_assignment
from split_vae_tpu.core.state import create_train_state
from split_vae_tpu.data import get_vae_dataset
from split_vae_tpu.data.loader import (
    DEVICE_RESIDENT_MAX_BYTES,
    device_prefetch,
    device_resident_batches,
    iterate_batches,
)
from split_vae_tpu.data.multicub import get_multicub
from split_vae_tpu.models.spair import LGSPAIR, LGGlimpseSPAIR, get_spair_model
from split_vae_tpu.models.vae import GMVae, LGGMVae, LGVae
from split_vae_tpu.ops.patches import augmented_channels
from split_vae_tpu.parallel.mesh import (
    activate_mesh, batch_sharding, create_mesh, shard_state)
from split_vae_tpu.train import optim
from split_vae_tpu.train import probes as probes_mod
from split_vae_tpu.train import schedules
from split_vae_tpu.train.steps import (
    make_spair_eval_step,
    make_spair_train_step,
    make_vae_eval_step,
    make_vae_train_step,
    normalize_images,
)
from split_vae_tpu.viz import artifacts as viz
from split_vae_tpu.viz import spair_artifacts as sviz


def build_vae_model(config, image_hw):
    if config.model == "lgvae":
        model = LGVae(config.global_latent_dims, config.local_latent_dims, image_hw)
        tx = optim.adam(config.learning_rate)
    elif config.model == "lggmvae":
        model = LGGMVae(config.global_latent_dims, config.local_latent_dims, image_hw,
                        config.y_size, config.tau)
        tx = optim.adam(schedules.gm_lr_schedule(config.learning_rate))
    elif config.model == "gmvae":
        model = GMVae(config.global_latent_dims, image_hw, config.y_size, config.tau)
        tx = optim.adam(schedules.gm_lr_schedule(config.learning_rate))
    else:
        raise NotImplementedError(config.model)
    return model, optim.nan_robust(tx)


def _train_iterator(train_ds, config, sharding):
    """Pick the batch path: device-resident gather when the dataset fits HBM
    (per-step host traffic = one 1 KB index array; the remote-relay TPU moves
    bulk host->device data at ~50 MB/s, which transfer-bound the loop 12x),
    else host streaming with double-buffered prefetch. `-host_data` forces
    the streaming path."""
    pc = jax.process_count()
    if pc > 1:
        # Pod path: config.batch_size is the GLOBAL batch; each host streams
        # its disjoint 1/pc slice and the prefetcher assembles global arrays
        # (make_array_from_process_local_data). The device-resident gather is
        # single-process-only (its HBM copy + take() are per-host local).
        if config.batch_size % pc:
            raise ValueError(
                f"batch_size {config.batch_size} must divide evenly over "
                f"{pc} processes")
        return device_prefetch(
            iterate_batches(train_ds, config.batch_size // pc, repeat=True,
                            seed=config.seed),
            sharding=sharding)
    nbytes = train_ds.images.nbytes + (
        train_ds.labels.nbytes if train_ds.labels is not None else 0)
    if not config.host_data and nbytes <= DEVICE_RESIDENT_MAX_BYTES:
        return device_resident_batches(
            train_ds, config.batch_size, repeat=True, seed=config.seed,
            sharding=sharding)
    return device_prefetch(
        iterate_batches(train_ds, config.batch_size, repeat=True, seed=config.seed),
        sharding=sharding)


def _apply_platform(config):
    from split_vae_tpu.core.runtime import setup_runtime
    from split_vae_tpu.parallel.mesh import maybe_initialize_distributed

    setup_runtime(config.platform)
    # bf16 activations when --compute_dtype bfloat16 (params stay f32).
    from split_vae_tpu.nn.common import set_activation_dtype

    set_activation_dtype(config.compute_dtype)
    # Multi-host (pod) bring-up, before any device query builds the local-only
    # view (--coordinator/--num_processes/--process_id; no-op single-host).
    maybe_initialize_distributed(
        config.coordinator, config.num_processes, config.process_id)


def train_vae(config, max_steps: Optional[int] = None):
    """Train LGVae / LGGMVae / GMVae (vae/trainer.py:72-421)."""
    _apply_platform(config)
    if config.debug_nans:
        jax.config.update("jax_debug_nans", True)
    run_dir = make_run_dir(config.output_dir)
    logger = RunLogger(run_dir)
    print(f"Run dir: {run_dir}")

    train_ds, test_ds, input_shape = get_vae_dataset(config)
    h, w = input_shape[1], input_shape[2]
    in_ch = augmented_channels(config.augmentation)

    model, tx = build_vae_model(config, (h, w))
    state = create_train_state(
        model, jnp.zeros((8, h, w, in_ch)), tx, seed=config.seed,
        training_kwargs={"training": True})
    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    print(f"Model {config.model}: {n_params:,} params")

    ckpt_dir = os.path.join(run_dir, "checkpoints")
    if config.resume:
        state = ckpt.restore_checkpoint(config.resume, state)
        print(f"Resumed from {config.resume} at step {int(state.step)}")

    mesh = activate_mesh(
        create_mesh(config.num_data_shards, config.num_model_shards))
    state = shard_state(state, mesh)
    sharding = batch_sharding(mesh)

    train_step = make_vae_train_step(config)
    eval_step = make_vae_eval_step(config, model.apply)

    # Classifier probe (SVHN-labeled runs only; vae/trainer.py:81-97)
    gm = isinstance(model, (LGGMVae, GMVae))
    probe_step = None
    cls_vars = None
    if config.label and config.dataset.lower().startswith("svhn"):
        cls_vars, cls_model = probes_mod.load_or_train_classifier(config)
        test_acc = probes_mod.evaluate_classifier(cls_vars, cls_model, test_ds)
        print(f"Classifier test acc: {test_acc:.4f}")
        # Persist the sanity accuracy and refuse to trust a broken probe
        # quietly: a frozen classifier near chance on REAL test images makes
        # every probe column meaningless (this exact failure silently zeroed
        # the round-4 300k digits run's probes — see train/probes.py).
        logger.log(int(state.step), {"classifier_test_acc": float(test_acc)},
                   prefix="meta/")
        if test_acc < 0.5:
            print("WARNING: probe classifier is near chance on real test "
                  "images; classifier_* probe metrics will be unreliable "
                  "(wrong dataset flavor or undertrained probe).")
        if not isinstance(model, GMVae):
            probe_step = probes_mod.make_vae_probe_step(
                model, cls_model, gm=isinstance(model, LGGMVae))

    labeled = train_ds.labels is not None
    train_iter = _train_iterator(train_ds, config, sharding)

    train_metrics = MeanMetrics()
    timer = StepTimer()
    eval_key = jax.random.PRNGKey(config.seed + 1)
    total_steps = min(config.training_steps, max_steps or config.training_steps)

    step = int(state.step)
    while step <= total_steps:
        batch = next(train_iter)
        images = batch[0] if labeled else batch
        with maybe_profile(config.profile_dir if step == 100 else None, step):
            state, m = train_step(state, images)
        train_metrics.update(m)
        timer.add(config.batch_size)
        step = int(step) + 1

        if config.log_every and step % config.log_every == 0                 and not (config.eval_interval
                         and step % config.eval_interval == 0):
            r = train_metrics.result()
            print(f"[step {step}] total_loss: {r.get('total_loss', float('nan')):.4f}")

        if ((config.eval_interval and step % config.eval_interval == 0)
                or step == total_steps):
            rate = timer.rate(sync_value=m["total_loss"])
            tm = train_metrics.result()
            tm["imgs_per_sec"] = rate
            logger.log(step, tm, prefix="train/")
            train_metrics.reset()

            # --- full test sweep (vae/trainer.py:317-349) ---
            test_metrics = MeanMetrics()
            all_labels, all_pred = [], []
            last_out = None
            last_images = None
            for tb in iterate_batches(test_ds, config.batch_size, shuffle=False):
                t_imgs, t_labels = tb if labeled else (tb, None)
                eval_key, k = jax.random.split(eval_key)
                out, m, images6 = eval_step(state.params, k, jnp.asarray(t_imgs))
                test_metrics.update(m)
                last_out, last_images = out, images6
                if t_labels is not None and probe_step is not None:
                    eval_key, k = jax.random.split(eval_key)
                    test_metrics.update(
                        probe_step(state.params, cls_vars, k, out, jnp.asarray(t_labels)))
                if t_labels is not None and gm:
                    all_labels.append(np.asarray(t_labels))
                    all_pred.append(np.asarray(out.y_logits))
            results = test_metrics.result()
            if all_labels:
                labels_cat = np.concatenate(all_labels)
                pred_cat = np.concatenate(all_pred)
                cluster_pred = linear_assignment(labels_cat, pred_cat)
                results["classifier_cluster_acc"] = float(
                    (cluster_pred.argmax(1) == labels_cat.argmax(1)).mean())
            logger.log(step, results, prefix="test/")

            # --- visualization (vae/trainer.py:385-403) ---
            try:
                _vae_visualize(config, model, state.params, eval_key, last_images,
                               test_ds, run_dir, step)
            except Exception as e:  # viz must never kill training
                print(f"[viz] skipped: {type(e).__name__}: {e}")

            timer.reset()

        if ((config.checkpoint_interval
             and step % config.checkpoint_interval == 0)
                or step == total_steps):
            ckpt.save_checkpoint(ckpt_dir, state)

    ckpt.save_weights(os.path.join("models", os.path.basename(run_dir) + ".msgpack"),
                      state.params)
    logger.close()
    print("Training done!")
    return state, run_dir


def _vae_visualize(config, model, params, key, last_images, test_ds, run_dir, step):
    keys = jax.random.split(key, 8)
    suffix = f"_it_{step}"
    if not isinstance(model, GMVae):
        viz.generate(model, params, keys[0], filename=f"generate_it_{step}", filepath=run_dir)
        if last_images is not None:
            viz.reconstruction_test_lg_vae(
                model, params, np.asarray(last_images), keys[1], filename=suffix,
                filepath=run_dir)
        viz.generate_varying_latent(model, params, keys[2], vary="lower",
                                    filename=f"vary_lower_it_{step}", filepath=run_dir)
        viz.generate_varying_latent(model, params, keys[3], vary="upper",
                                    filename=f"vary_upper_it_{step}", filepath=run_dir)
        if config.dataset.lower().startswith("svhn"):
            test_imgs = normalize_images(jnp.asarray(test_ds.images), "tanh")
            viz.style_transfer_test(model, params, np.asarray(test_imgs), keys[4],
                                    filename=suffix, filepath=run_dir)
        elif last_images is not None and last_images.shape[0] >= 20:
            viz.style_transfer_celeba(model, params, np.asarray(last_images), keys[4],
                                      filename=suffix, filepath=run_dir)
    if config.viz and isinstance(model, LGGMVae):
        if last_images is not None:
            viz.unseen_cluster_lg(model, params, [np.asarray(last_images)], keys[5],
                                  filename=suffix, filepath=run_dir)
        viz.generate_cluster(model, params, keys[6], vary="zg",
                             filename=f"generate_cluster_fix_zl_it_{step}", filepath=run_dir)
        viz.generate_cluster(model, params, keys[7], vary="zg_zl",
                             filename=f"generate_cluster_it_{step}", filepath=run_dir)
        viz.generate_cluster(model, params, keys[5], vary="y_zg",
                             filename=f"generate_multi_cluster_it_{step}", filepath=run_dir)


def train_spair(config, max_steps: Optional[int] = None):
    """Train SPAIR / BG-SPAIR / LG-SPAIR (spair/trainer.py:112-424)."""
    _apply_platform(config)
    if config.debug_nans:
        jax.config.update("jax_debug_nans", True)
    run_dir = make_run_dir(config.output_dir)
    logger = RunLogger(run_dir)
    print(f"Run dir: {run_dir}")

    train_ds, test_sets, input_shape, _ = get_multicub(config)
    size, num_channel = input_shape[1], input_shape[3]
    config.image_size = (size, size, num_channel)

    model = get_spair_model(config)
    # Keras Adam(clipnorm=1.0) clips per tensor, not globally (spair/main.py:109).
    tx = optim.nan_robust(optax.chain(
        optim.clip_by_per_tensor_norm(1.0), optim.adam(config.learning_rate)))
    in_ch = num_channel * 2 if config.model == "lg_spair" else num_channel
    state = create_train_state(
        model, jnp.zeros((config.batch_size, size, size, in_ch), jnp.float32), tx,
        seed=config.seed, training_kwargs={"training": True})
    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    print(f"Model {config.model}: {n_params:,} params")

    ckpt_dir = os.path.join(run_dir, "checkpoints")
    if config.resume:
        state = ckpt.restore_checkpoint(config.resume, state)
        print(f"Resumed from {config.resume} at step {int(state.step)}")

    mesh = activate_mesh(
        create_mesh(config.num_data_shards, config.num_model_shards))
    state = shard_state(state, mesh)
    sharding = batch_sharding(mesh)

    train_step = make_spair_train_step(config)
    eval_step = make_spair_eval_step(config, model.apply)

    train_iter = _train_iterator(train_ds, config, sharding)

    train_metrics = MeanMetrics()
    timer = StepTimer()
    eval_key = jax.random.PRNGKey(config.seed + 1)
    total_steps = min(config.training_steps, max_steps or config.training_steps)

    step = int(state.step)
    while step <= total_steps:
        batch = next(train_iter)
        state, m = train_step(state, batch)
        train_metrics.update(m)
        timer.add(config.batch_size)
        step = int(step) + 1

        if config.log_every and step % config.log_every == 0                 and not (config.eval_interval
                         and step % config.eval_interval == 0):
            r = train_metrics.result()
            print(f"[step {step}] total_loss: {r.get('total_loss', float('nan')):.4f}")

        if ((config.eval_interval and step % config.eval_interval == 0)
                or step == total_steps):
            rate = timer.rate(sync_value=m["total_loss"])
            tm = train_metrics.result()
            tm["imgs_per_sec"] = rate
            logger.log(step, tm, prefix="train/")
            train_metrics.reset()

            try:
                # Forward the last train batch once (outside the lean train
                # step) for the decomposition plot (spair/trainer.py:331-378).
                eval_key, k = jax.random.split(eval_key)
                plot_out, _, plot_images = eval_step(state.params, k, batch)
                sviz.train_decomposition_plot(
                    jax.device_get(plot_images), jax.device_get(plot_out),
                    filename=str(step), filepath=run_dir)
            except Exception as e:
                print(f"[viz] train plot skipped: {type(e).__name__}: {e}")

            # Dual test sweep: seen + unseen backgrounds (spair/trainer.py:381-401)
            for test_num, test_ds_i in enumerate(test_sets):
                test_metrics = MeanMetrics()
                viz_images = None
                labeled = test_ds_i.labels is not None
                for tb in iterate_batches(test_ds_i, config.batch_size, shuffle=False):
                    t_imgs, t_labels = tb if labeled else (tb, None)
                    eval_key, k = jax.random.split(eval_key)
                    out, m, images_aug = eval_step(
                        state.params, k, jnp.asarray(t_imgs),
                        jnp.asarray(t_labels) if t_labels is not None else None)
                    test_metrics.update(m)
                    viz_images = images_aug
                logger.log(step, test_metrics.result(), prefix=f"test{test_num}/")

                try:
                    suffix = f"_it_{step}_{test_num}"
                    eval_key, k1, k2, k3, k4 = jax.random.split(eval_key, 5)
                    imgs = jax.device_get(viz_images)
                    sviz.reconstruction_test(model.apply, state.params, imgs, k1,
                                             filename=suffix, filepath=run_dir)
                    sviz.reconstruction_bbox(model.apply, state.params, imgs, k2,
                                             filename=suffix, filepath=run_dir)
                    sviz.glimpses_reconstruction_test(model.apply, state.params, imgs, k3,
                                                      filename=suffix, filepath=run_dir)
                    if isinstance(model, LGSPAIR):
                        sviz.x_hat_reconstruction_test(model.apply, state.params, imgs, k4,
                                                       filename=suffix, filepath=run_dir)
                    if isinstance(model, LGGlimpseSPAIR):
                        sviz.glimpses_local_reconstruction_test(
                            model.apply, state.params, imgs, k4,
                            filename=suffix, filepath=run_dir)
                except Exception as e:
                    print(f"[viz] skipped: {type(e).__name__}: {e}")

            timer.reset()

        if ((config.checkpoint_interval
             and step % config.checkpoint_interval == 0)
                or step == total_steps):
            ckpt.save_checkpoint(ckpt_dir, state)

    ckpt.save_weights(os.path.join("models", os.path.basename(run_dir) + ".msgpack"),
                      state.params)
    logger.close()
    print("Training done!")
    return state, run_dir
