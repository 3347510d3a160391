"""tools/prepare_data.py: the real-data preflight must be turnkey.

Two contracts: (a) every train command it prints parses against the real CLI
parsers with the intended model/dataset (a printed command that crashes, e.g.
an unknown dataset name, defeats the tool's purpose); (b) the validators
accept well-formed drops and reject malformed ones.
"""

import os
import shlex
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import prepare_data  # noqa: E402

from split_vae_tpu.core.config import parse_spair_args, parse_vae_args  # noqa: E402
from split_vae_tpu.data import get_vae_dataset  # noqa: E402


def _iter_commands():
    for group in prepare_data.COMMANDS.values():
        for line in group:
            if not line.startswith("#"):
                yield line


def test_all_printed_commands_parse():
    seen = 0
    for line in _iter_commands():
        argv = shlex.split(line)
        assert argv[:2] == ["python", "-m"] and argv[2].startswith(
            "split_vae_tpu.cli."), line
        parser = parse_vae_args if "vae_main" in argv[2] else parse_spair_args
        cfg = parser(argv[3:])  # raises (SystemExit) on any unknown flag
        # dataset names must be ones the dispatchers accept
        if "vae_main" in argv[2]:
            assert cfg.dataset.upper() in ("SVHN", "SVHN_NO_EXTRA",
                                           "CELEBA64", "CELEBA128"), line
        else:
            assert cfg.dataset.startswith("cub_"), line
        seen += 1
    assert seen >= 5  # the five BASELINE configs (+ the Table-1 bg_spair run)


def test_vae_dataset_dispatch_rejects_unknown():
    class C:
        dataset = "celeba"  # the name prepare_data used to (wrongly) print
        synthetic_data = True
        seed = 0

    with pytest.raises(NotImplementedError):
        get_vae_dataset(C())


def test_check_svhn_accepts_valid_and_flags_bad(tmp_path, capsys):
    from scipy.io import savemat

    d = tmp_path / "data"
    (d / "SVHN").mkdir(parents=True)
    x = np.random.randint(0, 255, (32, 32, 3, 12), np.uint8)
    y = np.random.randint(1, 11, (12, 1))
    for fname in ("train_32x32.mat", "test_32x32.mat"):
        savemat(str(d / "SVHN" / fname), {"X": x, "y": y})
    assert prepare_data.check_svhn(str(d))
    out = capsys.readouterr().out
    assert out.count("[ok]") == 2 and "[BAD]" not in out

    # corrupt shape -> [BAD], check fails
    savemat(str(d / "SVHN" / "train_32x32.mat"),
            {"X": x.transpose(3, 0, 1, 2), "y": y})
    prepare_data.check_svhn(str(d))
    assert "[BAD] SVHN/train_32x32.mat" in capsys.readouterr().out


def test_check_cub_validates_contract(tmp_path, capsys):
    d = tmp_path / "data"
    d.mkdir()
    sprites = np.zeros((20, 14, 14, 3), np.float32)
    sprites[:, 4:10, 4:10] = 200.0  # [0,255] range, zero-masked background
    np.save(str(d / "cub_train_seg_14x14_pad_20_masked.npy"), sprites)
    assert prepare_data.check_cub(str(d), build=False)
    assert "[ok] CUB train sprites" in capsys.readouterr().out

    # [0,1]-range sprites violate the spair/data.py:143 contract
    np.save(str(d / "cub_train_seg_14x14_pad_20_masked.npy"), sprites / 255.0)
    assert not prepare_data.check_cub(str(d), build=False)
    assert "[BAD] CUB sprites" in capsys.readouterr().out


def test_check_missing_everything_reports_missing(tmp_path, capsys):
    d = str(tmp_path / "empty")
    os.makedirs(d)
    assert not prepare_data.check_svhn(d)
    assert not prepare_data.check_celeba(d, build=False)
    assert not prepare_data.check_cub(d, build=False)
    assert not prepare_data.check_kylberg(d)
    assert capsys.readouterr().out.count("[missing]") >= 4
