#!/usr/bin/env python
"""Convert Spleeter TF checkpoints to the flax SpleeterUNet ``.npz`` format
consumed by ``adx_tpu.explainers.separation``.

Spleeter's pretrained bundles are TF1 name-based checkpoints whose Keras
layers are numbered *sequentially across stems* in graph-build order
(``conv2d``, ``conv2d_1``, …), one U-Net per instrument. Per stem the build
order is: 6 encoder (Conv2D + BatchNorm) pairs, 6 decoder
(Conv2DTranspose + BatchNorm) pairs, one final dilated Conv2D — i.e.
7 Conv2D, 12 BatchNormalization, 6 Conv2DTranspose per stem. Some exports
scope variables under ``<stem>/`` instead; both schemes are handled.

Kernel layouts: TF Conv2D is HWIO = flax ``nn.Conv``; TF Conv2DTranspose is
HWOI = flax ``nn.ConvTranspose(transpose_kernel=True)`` — no transposes
needed. BatchNorm γ/β land in the ``params`` collection, moving mean/var in
``batch_stats``.

Reference separation entry: src/lime_explainer.py:386-392 (audioLIME
SpleeterFactorization → spleeter:4stems). The mapping and the flax forward
are round-trip tested against a TF mirror in tests/test_separation_unet.py;
only the pretrained checkpoint download is egress-blocked here.
"""

from __future__ import annotations

import argparse
import re
import sys
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

from adx_tpu.explainers.separation import STEM_NAMES

# Keras graph-build order of the instruments (sets the sequential layer
# numbering). From spleeter's resources/*.json ``instrument_list``.
INSTRUMENT_ORDER = {
    "spleeter:2stems": ["vocals", "accompaniment"],
    "spleeter:4stems": ["vocals", "drums", "bass", "other"],
    "spleeter:5stems": ["vocals", "piano", "drums", "bass", "other"],
}

_PER_STEM_COUNT = {"conv2d": 7, "batch_normalization": 12, "conv2d_transpose": 6}

_NAME_RE = re.compile(
    r"(?:^|/)(conv2d_transpose|conv2d|batch_normalization)(?:_(\d+))?"
    r"/([A-Za-z_]+)$"
)

_BN_ATTR = {
    "gamma": ("params", "scale"),
    "beta": ("params", "bias"),
    "moving_mean": ("batch_stats", "mean"),
    "moving_variance": ("batch_stats", "var"),
}


def _flax_key(kind: str, j: int, attr: str) -> Optional[str]:
    """Within-stem (layer kind, index, TF attr) → flat flax key, or None."""
    if kind == "conv2d":
        if attr not in ("kernel", "bias"):
            return None
        layer = f"conv{j}" if j < 6 else "logit"
        return f"params/{layer}/{attr}"
    if kind == "conv2d_transpose":
        if attr not in ("kernel", "bias"):
            return None
        layer = f"up{j}" if j < 5 else "up_final"
        return f"params/{layer}/{attr}"
    if kind == "batch_normalization":
        if attr not in _BN_ATTR:
            return None
        if j < 6:
            layer = f"bn{j}"
        elif j < 11:
            layer = f"upbn{j - 6}"
        else:
            layer = "bn_final"
        coll, name = _BN_ATTR[attr]
        return f"{coll}/{layer}/{name}"
    return None


def map_tf_variables(
    variables: Dict[str, np.ndarray], instruments: List[str]
) -> Dict[str, Dict[str, np.ndarray]]:
    """{TF var name: array} → {stem: {flat flax key: array}}.

    Stems are resolved from a ``<stem>/`` scope prefix when present,
    otherwise from the sequential Keras layer index (build order =
    ``instruments``).
    """
    out: Dict[str, Dict[str, np.ndarray]] = {s: {} for s in instruments}
    for name, value in variables.items():
        m = _NAME_RE.search(name)
        if not m:
            continue
        kind, idx, attr = m.group(1), int(m.group(2) or 0), m.group(3)
        stem = next(
            (s for s in instruments if f"{s}/" in f"/{name}"), None
        )
        per = _PER_STEM_COUNT[kind]
        if stem is None:
            stem_i, j = divmod(idx, per)
            if stem_i >= len(instruments):
                continue
            stem = instruments[stem_i]
        else:
            # scoped exports may still carry global Keras numbering
            j = idx % per
        key = _flax_key(kind, j, attr)
        if key is not None:
            out[stem][key] = np.asarray(value)
    return out


def main():
    ap = argparse.ArgumentParser(description="Convert Spleeter TF checkpoint → npz")
    ap.add_argument("checkpoint", help="TF checkpoint prefix (e.g. .../4stems/model)")
    ap.add_argument("--model", default="spleeter:4stems", choices=sorted(STEM_NAMES))
    ap.add_argument(
        "--instrument-order",
        help="Comma-separated graph-build order if it differs from the default",
    )
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
    instruments = (
        args.instrument_order.split(",")
        if args.instrument_order
        else INSTRUMENT_ORDER[args.model]
    )
    variables = {
        name: reader.get_tensor(name)
        for name in reader.get_variable_to_shape_map()
    }
    per_stem = map_tf_variables(variables, instruments)

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    kind = args.model.split(":")[1]
    expected = 7 * 2 + 12 * 4 + 6 * 2  # conv k/b + bn 4-attrs + convT k/b
    for stem in STEM_NAMES[args.model]:
        flat = per_stem.get(stem, {})
        if not flat:
            print(f"[WARN] No variables found for stem {stem!r}")
            continue
        if len(flat) != expected:
            print(f"[WARN] Stem {stem!r}: {len(flat)} tensors (expected {expected})")
        path = out_dir / f"{kind}_{stem}.npz"
        np.savez(path, **flat)
        print(f"💾 {path} ({len(flat)} tensors)")
    print(f"Done. Set ADX_SPLEETER_WEIGHTS={out_dir}")


if __name__ == "__main__":
    main()
