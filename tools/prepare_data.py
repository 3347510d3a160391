"""Turnkey real-data preflight: validate pre-placed files, build caches,
print the exact train commands.

This environment has zero network egress, so the real datasets (SVHN .mat,
CelebA jpgs, CUB sprite .npy, Kylberg textures) must be dropped into
``data/`` by hand. This tool makes that drop require zero code reading:

    python tools/prepare_data.py            # validate whatever is present
    python tools/prepare_data.py --build    # also build the caches now

Expected layout (mirrors the reference's downloads):
    data/SVHN/train_32x32.mat               vae/data.py:23-31
    data/SVHN/test_32x32.mat
    data/SVHN/extra_32x32.mat               (optional but used by default)
    data/celeba/img_align_celeba/*.jpg      vae/data.py:83-108 (202,599 imgs)
    data/cub_train_seg_14x14_pad_20_masked.npy   spair/data.py:13-16
    data/cub_test_seg_14x14_pad_20_masked.npy
    data/kylberg/*.png                      spair/data.py:49,83-87 (texture bg)

Each check prints [ok]/[missing]/[BAD]; the summary lists the runnable
BASELINE configs with their exact commands.
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
from glob import glob

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Advisory md5s of the upstream SVHN .mat files (ufldl.stanford.edu).
# Mismatch => warn (re-hosted copies differ), never fail.
_SVHN_MD5 = {
    "train_32x32.mat": "e26dedcc434d2e4c54c9b2d4a06d8373",
    "test_32x32.mat": "eb5a983be6a315427106f1b5d1e5f6b7",
    "extra_32x32.mat": "a93ce644f1a588dc4d68dda5feec44a7",
}

CELEBA_EXPECTED = 202_599


def _md5(path: str, chunk: int = 1 << 22) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        while blob := f.read(chunk):
            h.update(blob)
    return h.hexdigest()


def check_svhn(data_dir: str) -> bool:
    ok = True
    any_found = False
    for fname in ("train_32x32.mat", "test_32x32.mat", "extra_32x32.mat"):
        path = os.path.join(data_dir, "SVHN", fname)
        optional = fname.startswith("extra")
        if not os.path.exists(path):
            print(f"[missing] SVHN/{fname}" + (" (optional)" if optional else ""))
            ok = ok and optional
            continue
        any_found = True
        try:
            from scipy.io import loadmat

            data = loadmat(path, variable_names=["X", "y"])
            x, y = data["X"], data["y"]
            assert x.shape[:3] == (32, 32, 3) and x.dtype == np.uint8, x.shape
            assert y.shape[0] == x.shape[3], (y.shape, x.shape)
            assert set(np.unique(y[:1000])) <= set(range(1, 11))
            digest = _md5(path)
            note = ("" if digest == _SVHN_MD5[fname]
                    else f" (md5 {digest} != upstream {_SVHN_MD5[fname]}; "
                         "re-hosted copy? shapes check out)")
            print(f"[ok] SVHN/{fname}: {x.shape[3]} images{note}")
        except Exception as e:  # noqa: report and continue with other checks
            print(f"[BAD] SVHN/{fname}: {e}")
            ok = False
    return ok and any_found


def check_celeba(data_dir: str, build: bool) -> bool:
    cache_dir = os.path.join(data_dir, "celeba")
    train_cache = os.path.join(cache_dir, "train_64x64.npy")
    if os.path.exists(train_cache):
        arr = np.load(train_cache, mmap_mode="r")
        print(f"[ok] celeba/train_64x64.npy cache: {arr.shape} {arr.dtype}")
        return True
    raw = os.path.join(cache_dir, "img_align_celeba")
    files = sorted(glob(os.path.join(raw, "*")))
    if not files:
        print("[missing] celeba/img_align_celeba/*.jpg (and no cache)")
        return False
    note = ("" if len(files) == CELEBA_EXPECTED
            else f" (expected {CELEBA_EXPECTED}; partial drop still works)")
    print(f"[ok] celeba/img_align_celeba: {len(files)} files{note}")
    if build:
        from split_vae_tpu.data.celeba import build_celeba_cache

        print("building CelebA 64x64 uint8 cache (one-time, ~minutes)...")
        build_celeba_cache(raw, cache_dir, 64)
        print(f"[ok] built {train_cache}")
    else:
        print("      (cache will be built on first run; --build to do it now)")
    return True


def check_cub(data_dir: str, build: bool) -> bool:
    train_npy = os.path.join(data_dir, "cub_train_seg_14x14_pad_20_masked.npy")
    test_npy = os.path.join(data_dir, "cub_test_seg_14x14_pad_20_masked.npy")
    if not os.path.exists(train_npy):
        print("[missing] cub_train_seg_14x14_pad_20_masked.npy "
              "(synthetic sprites will be used)")
        return False
    try:
        arr = np.load(train_npy, mmap_mode="r")
        assert arr.shape[1:] == (14, 14, 3), arr.shape
        sample = np.asarray(arr[: min(64, len(arr))])
        assert sample.max() > 1.5, "expected [0,255] range (spair/data.py:143)"
        frac_bg = float((sample == 0).all(axis=-1).mean())
        print(f"[ok] CUB train sprites: {arr.shape} "
              f"({frac_bg:.0%} zero-masked background)")
        if os.path.exists(test_npy):
            print(f"[ok] CUB test sprites: {np.load(test_npy, mmap_mode='r').shape}")
        else:
            print("[missing] CUB test sprites (train bank reused; optional)")
    except Exception as e:  # noqa
        print(f"[BAD] CUB sprites: {e}")
        return False
    if build:
        from split_vae_tpu.data.multicub import create_multicub_cache

        for name in ("cub_solid_fixed", "cub_ckb_rot_6"):
            print(f"building MultiCUB cache {name} (100k train)...")
            path = create_multicub_cache(name, data_dir, synthetic=False)
            print(f"[ok] {path}")
    else:
        print("      (MultiCUB 100k caches build on first run; --build now)")
    return True


def check_kylberg(data_dir: str) -> bool:
    files = glob(os.path.join(data_dir, "kylberg", "*.png"))
    if not files:
        print("[missing] kylberg/*.png (texture bg falls back to procedural)")
        return False
    print(f"[ok] kylberg textures: {len(files)} files")
    return True


# The five canonical BASELINE.md configs, 1:1 with the reference README
# commands (README.md:28-107 in /root/reference).
COMMANDS = {
    "svhn": [
        "# BASELINE config 1: SPLIT-VAE, SVHN recon/style-transfer",
        "python -m split_vae_tpu.cli.vae_main --beta 1 --patch_size 1",
        "# BASELINE config 3: SPLIT-GMVAE, SVHN clustering (Table 2)",
        "python -m split_vae_tpu.cli.vae_main --model lggmvae --beta 40 "
        "--alpha 40 --y_size 30 --patch_size 4 --dataset svhn "
        "--training_steps 3000000",
    ],
    "celeba": [
        "# BASELINE config 2: SPLIT-VAE, CelebA64 (the headline VAE bench)",
        "python -m split_vae_tpu.cli.vae_main --beta 30 --patch_size 8 "
        "--dataset celeba64 -no_label",
        "# BASELINE config 4: SPLIT-GMVAE, CelebA64 cluster generation",
        "python -m split_vae_tpu.cli.vae_main --model lggmvae --beta 120 "
        "--alpha 40 --y_size 30 --patch_size 8 --dataset celeba64 "
        "-no_label -viz --training_steps 3000000",
    ],
    "cub": [
        "# BASELINE config 5: SPLIT-SPAIR, Multi-Bird-Hard",
        "python -m split_vae_tpu.cli.spair_main --dataset cub_ckb_rot_6 "
        "--z_bg_beta 1 --patch_size 8 --latent_size 64 --bg_latent_size 64 "
        "--local_latent_size 64 --model lg_spair -split_z_l "
        "--z_what_beta 0.5 -concat_z_what -dense_local -dense_bg "
        "--training_steps 200000",
        "# Multi-Bird (Table 1): BG-SPAIR on solid backgrounds",
        "python -m split_vae_tpu.cli.spair_main --dataset cub_solid_fixed "
        "--z_bg_beta 10 --latent_size 64 --bg_latent_size 4 "
        "--model bg_spair -dense_bg --training_steps 200000",
    ],
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", default="data")
    ap.add_argument("--build", action="store_true",
                    help="build caches now instead of on first run")
    args = ap.parse_args()
    os.makedirs(args.data_dir, exist_ok=True)

    print(f"== preflight over {os.path.abspath(args.data_dir)} ==")
    ready = {
        "svhn": check_svhn(args.data_dir),
        "celeba": check_celeba(args.data_dir, args.build),
        "cub": check_cub(args.data_dir, args.build),
    }
    check_kylberg(args.data_dir)

    print("\n== runnable BASELINE configs ==")
    any_ready = False
    for key, cmds in COMMANDS.items():
        if ready[key]:
            any_ready = True
            for c in cmds:
                print(c)
        else:
            print(f"# {key}: data not present — see layout in this file's "
                  "docstring (add -synthetic_data to run offline)")
    if not any_ready:
        print("\nNo real data found. Every config also runs offline with "
              "-synthetic_data.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
