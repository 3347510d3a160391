"""Probe-classifier flavor keying + GM probe metric contract.

Regression tests for the round-4 bug where digits-flavor runs probed with a
blobs-trained classifier (chance accuracy on everything; VERDICT.md round 4
Missing #2): the classifier must train on the SAME synthetic flavor as the
run it scores, and its weights path must be keyed by flavor so stale weights
from another flavor can never be silently loaded.
"""

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _cfg(tmp_path, **kw):
    base = dict(label=True, synthetic_data=True, data_dir=str(tmp_path),
                seed=0, synthetic_style="digits", synthetic_size=512)
    base.update(kw)
    return types.SimpleNamespace(**base)


def test_classifier_weights_path_flavor_keyed(tmp_path):
    from split_vae_tpu.train.probes import classifier_weights_path

    digits = classifier_weights_path(_cfg(tmp_path))
    blobs = classifier_weights_path(_cfg(tmp_path, synthetic_style="blobs"))
    big = classifier_weights_path(_cfg(tmp_path, synthetic_size=8192))
    real = classifier_weights_path(_cfg(tmp_path, synthetic_data=False))
    assert len({digits, blobs, big, real}) == 4
    # real-data runs keep the reference-shaped name (vae/trainer.py:81-88)
    assert real.endswith("svhn_classifier_weights.msgpack")


def test_train_classifier_uses_run_flavor(tmp_path, monkeypatch):
    """A digits-run classifier must learn digits: >0.9 test accuracy.

    The round-4 bug trained it on blobs (synthetic_style dropped from the
    dataset cfg), which scores ~0.03-0.1 on digits — an order of magnitude
    below this bar.
    """
    monkeypatch.chdir(tmp_path)
    from split_vae_tpu.data.svhn import get_svhn
    from split_vae_tpu.train import probes

    config = _cfg(tmp_path)
    cls_vars = probes.train_classifier(config, epochs=8, verbose=False)
    from split_vae_tpu.nn.classifier import Classifier

    model = Classifier(latent_dims=256, target_shape=10)
    _, test_ds, _ = get_svhn(config, extra=False)
    acc = probes.evaluate_classifier(cls_vars, model, test_ds)
    assert acc > 0.9, f"digits classifier scored {acc:.3f} on digits test"


def test_gm_probe_emits_split_signature_metrics():
    """GM probes carry the parity keys plus the rangefix/swapped-y extras."""
    from split_vae_tpu.models.vae import LGGMVae
    from split_vae_tpu.nn.classifier import Classifier
    from split_vae_tpu.train.probes import make_vae_probe_step

    model = LGGMVae(8, 8, (32, 32), 5, 0.4)
    x = jnp.zeros((8, 32, 32, 6))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x)
    out = model.apply(variables, x, rngs={"sample": jax.random.PRNGKey(2)})

    classifier = Classifier(latent_dims=16, target_shape=10)
    cls_vars = classifier.init(
        {"params": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)},
        jnp.zeros((8, 32, 32, 3)))

    probe = make_vae_probe_step(model, classifier, gm=True)
    labels = jnp.eye(10)[jnp.arange(8) % 10]
    accs = probe(variables["params"], cls_vars, jax.random.PRNGKey(5), out, labels)
    expected = {
        "classifier_recon_acc", "classifier_random_z_l_acc",
        "classifier_random_z_g_acc", "probe_random_z_l_acc_rangefix",
        "probe_random_z_g_acc_rangefix", "probe_swapped_y_z_g_acc_rangefix",
        "probe_swapped_y_transfer_acc_rangefix",
    }
    assert expected == set(accs)
    for k, v in accs.items():
        assert 0.0 <= float(v) <= 1.0, k
