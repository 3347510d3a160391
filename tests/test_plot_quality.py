"""tools/plot_quality.py: the curve-archive renderer must handle both run
families (SPAIR count-acc rows, GMVAE cluster-acc rows) and skip files with
neither metric, so regenerating docs/quality/plots stays turnkey."""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import plot_quality  # noqa: E402


def _write_jsonl(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_plot_run_renders_both_families_and_skips_others(tmp_path):
    out = tmp_path / "plots"
    out.mkdir()

    spair = tmp_path / "run_spair.metrics.jsonl"
    _write_jsonl(spair, [
        {"step": 1000, "test0/count_acc": 0.1, "test1/count_acc": 0.0},
        {"step": 2000, "test0/count_acc": 0.5, "test1/count_acc": 0.2},
    ])
    p = plot_quality.plot_run(str(spair), str(out))
    assert p is not None and os.path.exists(p) and p.endswith("run_spair.png")

    gmvae = tmp_path / "run_digits.metrics.jsonl"
    _write_jsonl(gmvae, [
        {"step": 2000, "test/classifier_cluster_acc": 0.2},
        {"step": 4000, "test/classifier_cluster_acc": 0.6},
    ])
    p = plot_quality.plot_run(str(gmvae), str(out))
    assert p is not None and os.path.exists(p)

    train_only = tmp_path / "run_other.metrics.jsonl"
    _write_jsonl(train_only, [{"step": 500, "train/total_loss": 1.0}])
    assert plot_quality.plot_run(str(train_only), str(out)) is None


def test_plot_probes_companion(tmp_path):
    out = tmp_path / "plots"
    out.mkdir()

    # LGVae probe curve: recon + both rangefix resample probes, no cluster
    # metric — plot_run skips it, plot_probes renders the companion.
    probe_run = tmp_path / "lgvae_digits_probe.metrics.jsonl"
    _write_jsonl(probe_run, [
        {"step": 2000, "test/classifier_recon_acc": 0.4,
         "test/probe_random_z_l_acc_rangefix": 0.35,
         "test/probe_random_z_g_acc_rangefix": 0.12},
        {"step": 4000, "test/classifier_recon_acc": 0.7,
         "test/probe_random_z_l_acc_rangefix": 0.68,
         "test/probe_random_z_g_acc_rangefix": 0.10},
    ])
    assert plot_quality.plot_run(str(probe_run), str(out)) is None
    p = plot_quality.plot_probes(str(probe_run), str(out))
    assert p is not None and os.path.exists(p) and p.endswith(".probes.png")

    # A recon column alone is not a probe story.
    recon_only = tmp_path / "recon_only.metrics.jsonl"
    _write_jsonl(recon_only, [{"step": 500, "test/classifier_recon_acc": 0.5}])
    assert plot_quality.plot_probes(str(recon_only), str(out)) is None
