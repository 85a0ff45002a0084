"""Training data pipeline: the dataset-folder convention (folder name =
generator label, REAL = 0 / everything else = 1 — SURVEY.md dataset
convention) turned into fixed-shape batches for the sharded train step."""

from __future__ import annotations

from pathlib import Path
from typing import Iterator, List, Optional, Tuple

import numpy as np

from adx_tpu.io.audio_io import load_audio


def scan_dataset(base_path: str | Path) -> List[Tuple[Path, float]]:
    """(file, label) pairs: REAL → 0.0, any generator folder → 1.0."""
    base_path = Path(base_path)
    items: List[Tuple[Path, float]] = []
    for folder in sorted(p for p in base_path.iterdir() if p.is_dir()):
        label = 0.0 if folder.name.lower() == "real" else 1.0
        for f in sorted(list(folder.glob("*.wav")) + list(folder.glob("*.mp3"))):
            items.append((f, label))
    return items


def train_val_split(
    items: List[Tuple[Path, float]],
    val_fraction: float = 0.1,
    seed: int = 0,
) -> Tuple[List[Tuple[Path, float]], List[Tuple[Path, float]]]:
    """Stratified (per-label) shuffle split; at least one validation item
    per class when the class exists and ``val_fraction > 0``."""
    rng = np.random.default_rng(seed)
    train: List[Tuple[Path, float]] = []
    val: List[Tuple[Path, float]] = []
    for label in sorted({lab for _, lab in items}):
        group = [it for it in items if it[1] == label]
        order = rng.permutation(len(group))
        n_val = min(len(group) - 1, max(1, int(round(len(group) * val_fraction)))) \
            if val_fraction > 0 and len(group) > 1 else 0
        for i, idx in enumerate(order):
            (val if i < n_val else train).append(group[idx])
    return train, val


def batch_iterator(
    items: List[Tuple[Path, float]],
    batch_size: int,
    n_samples: int,
    sr: int,
    input_sr: int = 44100,
    shuffle: bool = True,
    seed: int = 0,
    epochs: Optional[int] = None,
    drop_last: bool = True,
) -> Iterator[dict]:
    """Decode → resample to the model rate → fix length → fixed-shape batches.

    Decoding happens on host while the previous batch trains on device (the
    natural pipeline from Python's eager loop + JAX async dispatch).

    ``drop_last=True`` (the default) keeps every batch exactly
    ``batch_size`` wide — the jitted train step needs fixed shapes.  Eval
    passes ``drop_last=False`` so the tail items still count: the final
    batch is then narrower than ``batch_size`` (``eval_fn`` pads to the
    data axis itself and trims per-example outputs, so no item is lost).
    """
    from adx_tpu.ops.audio import resample_poly

    rng = np.random.default_rng(seed)
    if drop_last and len(items) < batch_size:
        # with epochs=None this would otherwise spin forever yielding
        # nothing (stop <= 0 every epoch) — fail loudly instead
        raise ValueError(
            f"batch_iterator: {len(items)} items < batch_size={batch_size} "
            f"with drop_last=True would never yield a batch; lower "
            f"batch_size or pass drop_last=False"
        )
    epoch = 0
    while epochs is None or epoch < epochs:
        order = np.arange(len(items))
        if shuffle:
            rng.shuffle(order)
        stop = len(order) - batch_size + 1 if drop_last else len(order)
        for lo in range(0, max(stop, 0), batch_size):
            width = min(batch_size, len(order) - lo)
            waves = np.zeros((width, n_samples), np.float32)
            labels = np.zeros((width,), np.float32)
            for bi, idx in enumerate(order[lo : lo + width]):
                path, label = items[idx]
                y, _ = load_audio(path, sr=input_sr, mono=True)
                if input_sr != sr:
                    y = resample_poly(y, input_sr, sr)
                n = min(len(y), n_samples)
                waves[bi, :n] = y[:n]
                labels[bi] = label
            yield {"wave": waves, "label": labels, "epoch": epoch}
        epoch += 1
