"""Data-prep pipeline driver — the notebook's cells 6-8 as a proper module.

Output taxonomy (exactly what the cross-run ``extract_run_label`` parsers
expect — SURVEY.md §2.5):
``OUT_ROOT/minus{14,23}/{base,mp3_192,resample22k,noise_snr30,reverb_room}/
GROUP/.../stem.wav``, 16-bit WAV with TPDF dither, all arms re-normalized to
−14 LUFS post-degradation, plus ``pipeline_log.csv`` telemetry.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, List, Optional

import numpy as np

from adx_tpu.dataprep.degrade import (
    degrade_add_noise,
    degrade_mp3_roundtrip,
    degrade_resample,
    degrade_reverb_synthetic,
)
from adx_tpu.dataprep.loudness import normalize_to_lufs_with_tp, tpdf_dither
from adx_tpu.io.audio_io import load_audio, write_wav

AUDIO_EXTS = {".mp3", ".wav", ".flac", ".m4a", ".aac", ".ogg"}
BASE_TARGETS_LUFS = [-14.0, -23.0]
POST_DEGRAD_TARGET_LUFS = -14.0
TRUE_PEAK_LIMIT_DBTP = -1.0
OVERSAMPLE_TP = 4
KNOWN_GROUPS = ["REAL", "SUNO_PRO", "SUNO", "UDIO", "ElevenLabs"]

ARMS = {
    "mp3_192": lambda y, sr: degrade_mp3_roundtrip(y, sr, bitrate="192k"),
    "resample22k": lambda y, sr: degrade_resample(y, sr, down_sr=22050)[0],
    "noise_snr30": lambda y, sr: degrade_add_noise(y, snr_db=30),
    "reverb_room": lambda y, sr: degrade_reverb_synthetic(y, sr, rt60=0.6, mix=0.15),
}


def find_audio_files(paths: List[str]) -> List[Path]:
    files = []
    for p in paths:
        path = Path(p)
        if path.is_file() and path.suffix.lower() in AUDIO_EXTS:
            files.append(path)
        elif path.is_dir():
            files.extend(
                fp for fp in sorted(path.rglob("*")) if fp.suffix.lower() in AUDIO_EXTS
            )
    return files


def infer_group_from_path(fp: Path) -> str:
    s = str(fp).replace("\\", "/").lower()
    for g in KNOWN_GROUPS:
        if f"/{g.lower()}/" in s:
            return g
    return "UNKNOWN"


_WINDOWS_BAD = str.maketrans({c: "_" for c in '<>:"/\\|?*'})


def sanitize_stem(stem: str, max_len: int = 180) -> str:
    """Windows-safe output stem (notebook cell 7 ``sanitize_stem_windows``):
    reserved characters and non-printable-ASCII become ``_``, trailing
    spaces/dots are stripped, over-long names are middle-elided."""
    safe = stem.translate(_WINDOWS_BAD)
    safe = "".join(ch if 32 <= ord(ch) <= 126 else "_" for ch in safe)
    safe = safe.strip().rstrip(" .")
    if len(safe) > max_len:
        half = max_len // 2 - 2
        safe = safe[:half] + "__" + safe[-half:]
    return safe


def _save_16bit(out_dir: Path, name: str, y: np.ndarray, sr: int, dither: bool = True) -> Path:
    out_dir.mkdir(parents=True, exist_ok=True)
    out = out_dir / (sanitize_stem(Path(name).stem) + ".wav")
    y_out = tpdf_dither(y, 16) if dither else y
    write_wav(out, np.clip(y_out, -1.0, 1.0), sr)
    return out


def audio_inventory(paths: List[str], out_csv: Optional[Path] = None):
    """Per-file sr / duration / LUFS inventory (notebook cells 0-4)."""
    import pandas as pd

    from adx_tpu.dataprep.loudness import integrated_lufs, to_mono, true_peak_dbtp

    rows = []
    for fp in find_audio_files(paths):
        try:
            y, sr = load_audio(fp, sr=None, mono=False)
            mono = to_mono(y)
            rows.append(
                {
                    "file_path": str(fp),
                    "group": infer_group_from_path(fp),
                    "sr": sr,
                    "duration_s": mono.shape[-1] / sr,
                    "lufs": integrated_lufs(mono, sr),
                    "true_peak_dbtp": true_peak_dbtp(mono, sr),
                }
            )
        except Exception as e:  # noqa: BLE001 — inventory keeps going
            rows.append({"file_path": str(fp), "error": str(e)})
    df = pd.DataFrame(rows)
    if out_csv is not None:
        Path(out_csv).parent.mkdir(parents=True, exist_ok=True)
        df.to_csv(out_csv, index=False)
        print(f"[INFO] Inventory saved: {out_csv}")
    return df


def plot_inventory(df, out_dir: Path):
    """Inventory distribution plots (notebook cells 1-4: per-group LUFS /
    duration / sample-rate histograms)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import seaborn as sns

    import adx_tpu.viz  # noqa: F401 — enables the fast-PNG savefig default

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    df = df[df.get("error").isna()] if "error" in df.columns else df
    if df.empty:
        return
    for col, fname in [("lufs", "lufs_by_group.png"), ("duration_s", "duration_by_group.png")]:
        if col not in df.columns:
            continue
        plt.figure(figsize=(10, 6))
        sns.boxplot(data=df, x="group", y=col)
        plt.title(f"{col} per group", fontweight="bold")
        plt.xticks(rotation=45)
        plt.grid(axis="y", alpha=0.3)
        plt.tight_layout()
        plt.savefig(out_dir / fname, dpi=200, bbox_inches="tight")
        plt.close()
    if "sr" in df.columns:
        plt.figure(figsize=(8, 5))
        df["sr"].value_counts().plot(kind="bar")
        plt.title("Sample rates", fontweight="bold")
        plt.tight_layout()
        plt.savefig(out_dir / "sample_rates.png", dpi=200, bbox_inches="tight")
        plt.close()
    print(f"[INFO] Inventory plots → {out_dir}")


def process_file(
    fp: Path,
    out_root: Path,
    sr: int = 44100,
    arms: Optional[List[str]] = None,
    lufs_targets: Optional[List[float]] = None,
) -> List[Dict[str, Any]]:
    """Base normalization at the LUFS targets (notebook default −14/−23)
    plus the enabled degradation arms."""
    arms = list(ARMS) if arms is None else arms
    targets = list(BASE_TARGETS_LUFS) if lufs_targets is None else [
        -abs(float(t)) for t in lufs_targets
    ]
    y, sr = load_audio(fp, sr=sr, mono=True)
    group = infer_group_from_path(fp)
    name = fp.name
    logs = []

    for target in targets:
        y_base, info = normalize_to_lufs_with_tp(
            y, sr, target_lufs=target,
            tp_limit_db=TRUE_PEAK_LIMIT_DBTP, oversample_tp=OVERSAMPLE_TP,
        )
        # int targets keep the reference's minus14/minus23 taxonomy; a
        # fractional target keeps its decimals (int() truncation collided
        # -16.2 and -16.8 into ONE minus16 tree, last writer wins)
        minus = f"minus{abs(target):g}"
        out = _save_16bit(out_root / minus / "base" / group, name, y_base, sr)
        logs.append(
            {"arm": "base", "base_minus": abs(target), "group": group,
             "target_lufs": target, "output_path": str(out), "sr": sr,
             "input_path": str(fp), **info}
        )

        for arm in arms:
            y_deg = ARMS[arm](y_base, sr)
            y_final, info_n = normalize_to_lufs_with_tp(
                y_deg, sr, target_lufs=POST_DEGRAD_TARGET_LUFS,
                tp_limit_db=TRUE_PEAK_LIMIT_DBTP, oversample_tp=OVERSAMPLE_TP,
            )
            out = _save_16bit(out_root / minus / arm / group, name, y_final, sr)
            logs.append(
                {"arm": arm, "base_minus": abs(target), "group": group,
                 "output_path": str(out), "sr": sr, "input_path": str(fp), **info_n}
            )
    return logs


def run_pipeline(
    input_paths: List[str],
    out_root: str | Path,
    sr: int = 44100,
    arms: Optional[List[str]] = None,
    lufs_targets: Optional[List[float]] = None,
) -> None:
    import pandas as pd

    files = find_audio_files(input_paths)
    out_root = Path(out_root)
    all_logs: List[Dict[str, Any]] = []
    for fp in files:
        print(f"[INFO] Processing: {fp}")
        try:
            all_logs.extend(process_file(fp, out_root, sr=sr, arms=arms,
                                         lufs_targets=lufs_targets))
        except Exception as e:  # noqa: BLE001 — per-file resilience
            print(f"[ERROR] file={fp}, err={e}")
            all_logs.append({"input_path": str(fp), "error": str(e)})
    out_root.mkdir(parents=True, exist_ok=True)
    log_path = out_root / "pipeline_log.csv"
    pd.DataFrame(all_logs).to_csv(log_path, index=False)
    print(f"[INFO] Log saved: {log_path} ({len(all_logs)} rows)")
