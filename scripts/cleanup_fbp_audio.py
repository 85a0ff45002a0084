#!/usr/bin/env python
"""Cleanup tool: delete bulky ``batches_vis`` / ``freq_batches`` directories
from FBP result trees (capability-equivalent to the reference's root-level
``delete_files_wav.py``, turned into a proper CLI instead of edit-the-source
constants)."""

from __future__ import annotations

import argparse
import shutil
from pathlib import Path


def delete_files_by_extension(root_dir, extensions):
    root = Path(root_dir)
    if not root.is_dir():
        print(f"Not a directory: {root_dir}")
        return 0
    count = 0
    for ext in extensions:
        for file_path in root.glob(f"**/*{ext}"):
            if file_path.is_file():
                print(f"Deleting: {file_path}")
                file_path.unlink()
                count += 1
    print(f"Deleted {count} files.")
    return count


def delete_folder(folder_path, dry_run: bool = False):
    folder = Path(folder_path)
    if folder.exists() and folder.is_dir():
        print(f"{'Would delete' if dry_run else 'Deleting'} folder: {folder}")
        if not dry_run:
            shutil.rmtree(folder)
    else:
        print(f"Folder missing or not a directory: {folder}")


def main():
    ap = argparse.ArgumentParser(description="Delete bulky FBP audio/vis exports")
    ap.add_argument("--bands-root", required=True, help="<experiment>/bands directory")
    ap.add_argument("--component", default="mixture")
    ap.add_argument(
        "--targets", nargs="+", default=["batches_vis", "freq_batches"],
        help="Subdirectory names to remove under each track/component",
    )
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()

    bands_root = Path(args.bands_root)
    for model_dir in sorted(p for p in bands_root.iterdir() if p.is_dir()):
        print(f"Processing folder: {model_dir.name}")
        for track_dir in sorted(p for p in model_dir.iterdir() if p.is_dir()):
            comp_path = track_dir / args.component
            for target in args.targets:
                delete_folder(comp_path / target, dry_run=args.dry_run)
                # save-audio modes nest the targets one level deeper
                for sub in ("separated_bands", "reversed_separated_bands"):
                    if (comp_path / sub / target).exists():
                        delete_folder(comp_path / sub / target, dry_run=args.dry_run)


if __name__ == "__main__":
    main()
