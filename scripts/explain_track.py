#!/usr/bin/env python
"""One-command full explanation of an audio file (FBP + occlusion + LIME)."""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

from adx_tpu.explain import explain_track
from adx_tpu.io.results import convert_to_native


def main():
    ap = argparse.ArgumentParser(description="Fully explain one track (FBP + occlusion + LIME)")
    ap.add_argument("audio", help="Audio file (wav; mp3 with ffmpeg)")
    ap.add_argument("--model", default="awsaf49/sonics-spectttra-alpha-120s")
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--out-dir", default=None, help="Write JSON + figures here")
    ap.add_argument("--duration", type=float, default=120.0)
    ap.add_argument("--lime-samples", type=int, default=500)
    ap.add_argument("--no-figures", action="store_true")
    ap.add_argument(
        "--server", default=None, metavar="URL",
        help="Use a RESIDENT explain worker instead of booting the TPU in "
        "this process: POST the file to <URL>/explain on a running "
        "`scripts/serve_sonics.py --explain` server. Ad-hoc CLI calls then "
        "pay only the warm sweep latency (~2.5 s at the production config) "
        "instead of the minutes-long per-process device grant + compile.",
    )
    args = ap.parse_args()

    if not Path(args.audio).is_file():
        # fail before the predictor build — model construction + compile can
        # take minutes on a cold TPU
        ap.error(f"audio file not found: {args.audio}")

    if args.server:
        from adx_tpu.serving import post_explain

        # the sweep runs at the SERVER's configuration — flags that only
        # affect a local engine are not shipped; say so instead of
        # silently accepting them
        ignored = []
        if args.duration != 120.0:
            ignored.append("--duration")
        if args.lime_samples != 500:
            ignored.append("--lime-samples")
        if args.no_figures:
            ignored.append("--no-figures")
        if ignored:
            print(f"⚠️ {' '.join(ignored)} ignored with --server: the sweep "
                  "runs at the resident worker's configuration",
                  file=sys.stderr)
        payload = json.dumps(
            convert_to_native(post_explain(args.server, args.audio)),
            indent=2, ensure_ascii=False,
        )
        if args.out_dir:  # still honor the local artifact request
            out = Path(args.out_dir)
            out.mkdir(parents=True, exist_ok=True)
            dest = out / f"{Path(args.audio).stem}_explanation.json"
            dest.write_text(payload, encoding="utf-8")
            print(f"💾 {dest}", file=sys.stderr)
        print(payload)
        return

    from adx_tpu.predict import LocalSonics

    predictor = LocalSonics.from_pretrained(args.model, checkpoint_dir=args.checkpoint_dir)
    record = explain_track(
        args.audio,
        predictor=predictor,
        duration=args.duration,
        num_samples_lime=args.lime_samples,
        out_dir=Path(args.out_dir) if args.out_dir else None,
        save_figures=not args.no_figures,
    )
    print(json.dumps(convert_to_native(record), indent=2, ensure_ascii=False))


if __name__ == "__main__":
    main()
