"""Evaluation helpers — capability-equivalent to the reference's
``project_utils/utils.py`` (torch test-loader inference, classification
report + confusion heatmap, ROC), rebuilt on the batched JAX predictor."""

from __future__ import annotations

from typing import Iterable, Tuple

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import seaborn as sns
from sklearn.metrics import (
    classification_report,
    confusion_matrix,
    roc_auc_score,
    roc_curve,
)

from adx_tpu.ops.db import amplitude_to_db
from adx_tpu.viz.display import specshow


def draw_spectro(spectro: np.ndarray, title: str, sr: int, output_path=None):
    """dB mel-spectrogram figure (reference ref=np.min semantics)."""
    # plain-numpy dB: under JAX_PLATFORMS=axon the CPU backend is hidden,
    # so a jnp round trip would ship the spectrogram through the TPU
    # tunnel per figure just to take a log10
    fig, ax = plt.subplots()
    ref = abs(float(np.min(spectro) + 1e-10))
    amin = 1e-5  # librosa amplitude_to_db defaults (amin, top_db=80)
    mag = np.abs(np.asarray(spectro, np.float64))
    S_dB = 20.0 * (np.log10(np.maximum(mag, amin)) - np.log10(max(ref, amin)))
    S_dB = np.maximum(S_dB, S_dB.max() - 80.0).astype(np.float32)
    img = specshow(S_dB, sr=sr, x_axis="time", y_axis="mel", ax=ax, cmap="magma")
    fig.colorbar(img, ax=ax, format="%+2.0f dB")
    ax.set(title=title)
    if output_path:
        plt.savefig(output_path, dpi=200, bbox_inches="tight")
    plt.close(fig)


def run_inference(
    predictor, batches: Iterable[dict], sr: int = 44100, threshold: float = 0.5
) -> Tuple[np.ndarray, np.ndarray]:
    """Batched inference over ``{'wave': [B, n], 'label': [B]}`` dicts →
    (binary predictions, labels). Each batch runs as one device program
    (the reference loops a torch model over a DataLoader)."""
    test_preds, test_labels = [], []
    for batch in batches:
        probs = predictor.predict_batch(np.asarray(batch["wave"]), sr=sr)
        test_preds.append(probs > threshold)
        test_labels.append(np.asarray(batch["label"]))
    return np.concatenate(test_preds), np.concatenate(test_labels)


def plot_classification_report(test_labels, test_preds, output_path=None):
    # labels=[0, 1] pins the matrix to 2×2 even when a small/skewed val
    # set contains only one class (unpinned, the 1×1 matrix crashes the
    # two-label heatmap and classification_report below)
    print(classification_report(test_labels, test_preds,
                                labels=[0, 1], target_names=["Real", "Fake"],
                                zero_division=0))
    cm = confusion_matrix(test_labels, test_preds, labels=[0, 1])
    plt.figure(figsize=(8, 6))
    sns.heatmap(
        cm, annot=True, fmt="d", cmap="Blues",
        xticklabels=["Real", "Fake"], yticklabels=["Real", "Fake"],
    )
    plt.ylabel("Real labels")
    plt.xlabel("Predicted labels")
    plt.title("Confusion Matrix")
    if output_path:
        plt.savefig(output_path, dpi=200, bbox_inches="tight")
    plt.close()


def plot_roc_curve(test_labels, test_scores, output_path=None) -> float:
    auc = roc_auc_score(test_labels, test_scores)
    print(f"AUC: {auc:.4f}")
    fpr, tpr, _ = roc_curve(test_labels, test_scores)
    plt.figure(figsize=(8, 6))
    plt.plot(fpr, tpr, color="blue", label=f"ROC curve (area = {auc:.4f})")
    plt.plot([0, 1], [0, 1], color="red", linestyle="--")
    plt.xlim([0.0, 1.0])
    plt.ylim([0.0, 1.05])
    plt.xlabel("False Positive Rate")
    plt.ylabel("True Positive Rate")
    plt.title("Receiver Operating Characteristic")
    plt.legend(loc="lower right")
    if output_path:
        plt.savefig(output_path, dpi=200, bbox_inches="tight")
    plt.close()
    return float(auc)
