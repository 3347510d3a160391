"""End-to-end integration: tiny synthetic runs of every CLI path.

Exercises data -> augment -> model -> loss -> update -> eval -> probes ->
artifacts -> checkpoint on the 8-device virtual CPU mesh.
"""

import glob
import os

import numpy as np
import pytest

from split_vae_tpu.core.config import SpairConfig, VaeConfig


def _vae_cfg(tmp_path, **kw):
    base = dict(
        synthetic_data=True, data_dir=str(tmp_path / "data"),
        output_dir=str(tmp_path / "out"), batch_size=16, eval_interval=5,
        training_steps=10, checkpoint_interval=5, seed=0,
        global_latent_dims=8, local_latent_dims=8, y_size=5)
    base.update(kw)
    return VaeConfig(**base)


@pytest.fixture(autouse=True)
def _chdir(tmp_path, monkeypatch):
    # 'models/' weights are written relative to cwd like the reference.
    monkeypatch.chdir(tmp_path)


def test_train_vae_lgvae_end_to_end(tmp_path):
    from split_vae_tpu.train.loop import train_vae

    # checkpoint_interval=0 = "final checkpoint only" (regression: the cadence
    # check used to divide by zero); the checkpoint assertions below still
    # hold via the step == total_steps save.
    config = _vae_cfg(tmp_path, model="lgvae", no_label=True, beta=1.0,
                      checkpoint_interval=0)
    state, run_dir = train_vae(config)
    assert int(state.step) >= 10
    # metrics.jsonl + artifacts + checkpoint exist
    assert os.path.exists(os.path.join(run_dir, "metrics.jsonl"))
    assert glob.glob(os.path.join(run_dir, "generate_it_*.png"))
    assert glob.glob(os.path.join(run_dir, "x_reconstruction_test_it_*.png"))
    assert glob.glob(os.path.join(run_dir, "vary_lower_it_*.png"))
    assert glob.glob(os.path.join(run_dir, "checkpoints", "checkpoint_*.msgpack"))
    assert glob.glob("models/*.msgpack")


def test_train_vae_lggmvae_with_probes(tmp_path):
    from split_vae_tpu.train.loop import train_vae

    config = _vae_cfg(tmp_path, model="lggmvae", beta=1.0, alpha=1.0, viz=True,
                      training_steps=6, eval_interval=3)
    state, run_dir = train_vae(config)
    # cluster metrics + probe metrics present in the JSONL
    import json

    records = [json.loads(l) for l in open(os.path.join(run_dir, "metrics.jsonl"))]
    test_recs = [r for r in records if any(k.startswith("test/") for k in r)]
    assert test_recs, records
    joined = {k for r in test_recs for k in r}
    assert "test/classifier_cluster_acc" in joined
    assert "test/classifier_recon_acc" in joined
    assert glob.glob(os.path.join(run_dir, "generate_cluster_fix_zl_it_*.png"))


def test_train_vae_resume(tmp_path):
    from split_vae_tpu.core import checkpoint as ckpt
    from split_vae_tpu.train.loop import train_vae

    config = _vae_cfg(tmp_path, model="lgvae", no_label=True, training_steps=5,
                      eval_interval=5)
    state, run_dir = train_vae(config)
    ckpt_dir = os.path.join(run_dir, "checkpoints")
    config2 = _vae_cfg(tmp_path, model="lgvae", no_label=True, training_steps=8,
                       eval_interval=4, resume=ckpt_dir)
    state2, _ = train_vae(config2)
    assert int(state2.step) >= 8


def test_train_spair_end_to_end(tmp_path):
    from split_vae_tpu.train.loop import train_spair

    config = SpairConfig(
        synthetic_data=True, data_dir=str(tmp_path / "data"),
        output_dir=str(tmp_path / "out"), batch_size=8, eval_interval=4,
        training_steps=8, model="spair", latent_size=8, bg_latent_size=4,
        local_latent_size=8, z_pres_anneal_step=10.0)
    state, run_dir = train_spair(config)
    assert int(state.step) >= 8
    assert glob.glob(os.path.join(run_dir, "x_reconstrcution_test_it_*_0.png"))
    assert glob.glob(os.path.join(run_dir, "x_reconstrcution_test_it_*_1.png"))
    assert glob.glob(os.path.join(run_dir, "x_reconstrcution_bbox_it_*.png"))
    assert glob.glob(os.path.join(run_dir, "glimpses_it_*.png"))
    assert glob.glob(os.path.join(run_dir, "train_recon_it_*.png"))
    import json

    records = [json.loads(l) for l in open(os.path.join(run_dir, "metrics.jsonl"))]
    joined = {k for r in records for k in r}
    assert "test0/MAE test" in joined and "test1/MAE test" in joined


def test_train_lg_spair_end_to_end(tmp_path):
    from split_vae_tpu.train.loop import train_spair

    config = SpairConfig(
        synthetic_data=True, data_dir=str(tmp_path / "data"),
        output_dir=str(tmp_path / "out"), batch_size=8, eval_interval=4,
        training_steps=4, model="lg_spair", latent_size=8, bg_latent_size=4,
        local_latent_size=8, split_z_l=True, concat_z_what=True,
        dense_bg=True, dense_local=True, z_pres_anneal_step=10.0,
        checkpoint_interval=0)  # regression: 0 used to ZeroDivisionError
    state, run_dir = train_spair(config)
    assert glob.glob(os.path.join(run_dir, "x_hat_reconstrcution_test_it_*.png"))


def test_count_metrics_mape_companion():
    """Quirk MAPE keeps tf.keras 1e-7-clip semantics; the nonzero companion
    carries the signal the quirk column destroys on zero-count images."""
    import jax.numpy as jnp
    from split_vae_tpu.train.steps import count_metrics

    labels = jnp.array([0.0, 2.0, 4.0])
    pred = jnp.array([1.0, 1.0, 4.0])
    m = count_metrics(pred, labels)
    # zero-count image: err 1 / 1e-7 * 100 = 1e9 dominates the quirk mean
    np.testing.assert_allclose(float(m["MAPE test"]), (1e9 + 50.0 + 0.0) / 3,
                               rtol=1e-6)
    # companion: mean over the two nonzero-count images only
    np.testing.assert_allclose(float(m["MAPE_nonzero test"]), 25.0, rtol=1e-6)
    np.testing.assert_allclose(float(m["MAE test"]), 2 / 3, rtol=1e-6)
    np.testing.assert_allclose(float(m["count_acc"]), 1 / 3, rtol=1e-6)


def test_vae_probe_step_accuracies(tmp_path):
    """Probe accuracies equal label-match fractions for a fixed-output classifier."""
    import jax
    import jax.numpy as jnp
    from split_vae_tpu.models.vae import LGVae
    from split_vae_tpu.nn.classifier import Classifier
    from split_vae_tpu.train.probes import make_vae_probe_step

    model = LGVae(8, 8, (32, 32))
    x = jnp.zeros((8, 32, 32, 6))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x)
    out = model.apply(variables, x, rngs={"sample": jax.random.PRNGKey(2)})

    classifier = Classifier(latent_dims=16, target_shape=10)
    cls_vars = classifier.init(
        {"params": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)},
        jnp.zeros((8, 32, 32, 3)))
    # Freeze the classifier to always predict class 0: zero final kernel, huge bias.
    import numpy as np
    cls_host = jax.device_get(cls_vars)
    final = sorted(k for k in cls_host["params"] if k.startswith("Dense"))[-1]
    cls_host["params"][final]["kernel"] = np.zeros_like(
        cls_host["params"][final]["kernel"])
    bias = np.full_like(cls_host["params"][final]["bias"], -100.0)
    bias[0] = 100.0
    cls_host["params"][final]["bias"] = bias

    probe = make_vae_probe_step(model, classifier, gm=False)
    labels = jnp.eye(10)[jnp.array([0, 0, 0, 1, 2, 3, 4, 5])]  # 3/8 class 0
    accs = probe(variables["params"], cls_host, jax.random.PRNGKey(5), out, labels)
    for k, v in accs.items():
        np.testing.assert_allclose(float(v), 3 / 8, err_msg=k)
