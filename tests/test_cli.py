"""CLI entry points: flag parsing -> dispatch, and the --runs repeat loop.

The heavy end-to-end paths are covered by tests/test_train_loop.py (direct
train_vae/train_spair calls) and the verify-skill CLI drives; these tests pin
the thin main() glue itself (reference: vae/main.py:63-79, spair/main.py:95).
"""

from split_vae_tpu.cli import spair_main, vae_main


def test_spair_main_repeats_runs(monkeypatch):
    calls = []
    monkeypatch.setattr(spair_main, "train_spair",
                        lambda config: calls.append(config))
    spair_main.main(["--runs", "3", "--model", "bg_spair", "-synthetic_data"])
    assert len(calls) == 3
    # every run sees the same parsed config (fresh run dirs come from
    # train_spair's timestamped output dir, reference spair/trainer.py:113)
    assert all(c is calls[0] for c in calls)
    assert calls[0].model == "bg_spair" and calls[0].runs == 3


def test_spair_main_default_single_run(monkeypatch):
    calls = []
    monkeypatch.setattr(spair_main, "train_spair",
                        lambda config: calls.append(config))
    spair_main.main(["-synthetic_data"])
    assert len(calls) == 1 and calls[0].model == "spair"


def test_vae_main_dispatch(monkeypatch):
    calls = []
    monkeypatch.setattr(vae_main, "train_vae",
                        lambda config: calls.append(config))
    vae_main.main(["--model", "lggmvae", "--beta", "40", "--alpha", "40",
                   "--y_size", "30", "--patch_size", "4", "-synthetic_data"])
    assert len(calls) == 1
    c = calls[0]
    assert (c.model, c.beta, c.alpha, c.y_size, c.patch_size) == (
        "lggmvae", 40.0, 40.0, 30, 4)
