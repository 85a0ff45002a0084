#!/usr/bin/env python
"""Convert Spleeter TF checkpoints to the flax SpleeterUNet ``.npz`` format
consumed by ``adx_tpu.explainers.separation``.

Requires TensorFlow to read the TF checkpoint bundle — run this on a
machine with TF installed; this container does not ship TF, so separation
falls back to the deterministic mask separator until converted weights are
provided via ``$ADX_SPLEETER_WEIGHTS``.
"""

from __future__ import annotations

import argparse
import re
import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

from adx_tpu.explainers.separation import STEM_NAMES

# TF variable name → (flax param path template, transform)
# Spleeter's U-Nets are stored per stem as <stem>/conv2d[_N]/kernel etc.
_RULES = [
    (r"conv2d(?:_(\d+))?/kernel", "conv{i}/kernel", "conv"),
    (r"conv2d(?:_(\d+))?/bias", "conv{i}/bias", "none"),
    (r"batch_normalization(?:_(\d+))?/gamma", "bn{i}/scale", "none"),
    (r"batch_normalization(?:_(\d+))?/beta", "bn{i}/bias", "none"),
    (r"batch_normalization(?:_(\d+))?/moving_mean", "bn{i}/mean", "none"),
    (r"batch_normalization(?:_(\d+))?/moving_variance", "bn{i}/var", "none"),
    (r"conv2d_transpose(?:_(\d+))?/kernel", "up{i}/kernel", "convT"),
    (r"conv2d_transpose(?:_(\d+))?/bias", "up{i}/bias", "none"),
]


def convert_stem(reader, stem: str) -> dict:
    out = {}
    var_map = reader.get_variable_to_shape_map()
    for name in sorted(var_map):
        if not name.startswith(f"{stem}/") and stem not in name:
            continue
        short = name.split(f"{stem}/")[-1]
        for pattern, template, transform in _RULES:
            m = re.fullmatch(pattern, short)
            if not m:
                continue
            idx = int(m.group(1) or 0)
            value = reader.get_tensor(name)
            if transform == "conv":
                pass  # TF HWIO == flax HWIO
            elif transform == "convT":
                # TF conv2d_transpose kernel is HWOI; flax ConvTranspose HWIO
                value = np.transpose(value, (0, 1, 3, 2))
            out[template.format(i=idx)] = value
            break
    return out


def main():
    ap = argparse.ArgumentParser(description="Convert Spleeter TF checkpoint → npz")
    ap.add_argument("checkpoint", help="TF checkpoint prefix (e.g. .../4stems/model)")
    ap.add_argument("--model", default="spleeter:4stems", choices=sorted(STEM_NAMES))
    ap.add_argument("--out-dir", required=True)
    args = ap.parse_args()

    try:
        from tensorflow.python.training import py_checkpoint_reader
    except ImportError:
        sys.exit(
            "TensorFlow is required to read Spleeter checkpoints. Run this "
            "converter on a machine with TF installed, then ship the .npz "
            "files and point $ADX_SPLEETER_WEIGHTS at them."
        )

    reader = py_checkpoint_reader.NewCheckpointReader(args.checkpoint)
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    kind = args.model.split(":")[1]
    for stem in STEM_NAMES[args.model]:
        flat = convert_stem(reader, stem)
        if not flat:
            print(f"[WARN] No variables found for stem {stem!r}")
            continue
        path = out_dir / f"{kind}_{stem}.npz"
        np.savez(path, **{f"params/{k}": v for k, v in flat.items()})
        print(f"💾 {path} ({len(flat)} tensors)")
    print(f"Done. Set ADX_SPLEETER_WEIGHTS={out_dir}")


if __name__ == "__main__":
    main()
