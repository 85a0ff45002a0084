#!/usr/bin/env python
"""Serve SpecTTTra predictions over HTTP (the Space-parity endpoint)."""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))


def main():
    ap = argparse.ArgumentParser(
        description="HTTP inference server: POST /predict with a WAV body, GET /health"
    )
    ap.add_argument("--model", default="awsaf49/sonics-spectttra-alpha-120s")
    ap.add_argument(
        "--checkpoint-dir", default=None,
        help="classifier weights; default: checkpoints/alpha120s/best when "
        "it exists (the committed trained flagship, like bench.py and the "
        "stage configs), else random init. Pass 'random' to force random.")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8756)
    ap.add_argument("--max-batch", type=int, default=8)
    ap.add_argument(
        "--batch-window-ms", type=float, default=0.0,
        help="coalesce concurrent requests arriving within this window "
        "into one batched forward (0 = serialized, the default)",
    )
    ap.add_argument(
        "--explain", action="store_true",
        help="also serve POST /explain: full FBP+occlusion+LIME explanation "
        "of the posted WAV (first request pays the sweep compiles)",
    )
    ap.add_argument(
        "--explain-batch-window-ms", type=float, default=150.0,
        help="coalesce concurrent /explain requests arriving within this "
        "window into one multi-track batched explanation (default 150; "
        "the upload-aware batcher dispatches a lone request immediately, "
        "so singles pay no window tax — pass 0 to serialize)",
    )
    ap.add_argument(
        "--explain-max-batch", type=int, default=4,
        help="cap on coalesced /explain batch size (each distinct size T "
        "traces a new multi-track program on first use — minutes cold; "
        "see --warm-batches)",
    )
    ap.add_argument(
        "--warm-batches", action="store_true",
        help="pre-trace the coalesced /explain T=1..max-batch programs at "
        "startup, OFF the request path (first concurrent pair then pays no "
        "multi-program trace)",
    )
    args = ap.parse_args()

    from adx_tpu.io.config import resolve_default_checkpoint

    ckpt = resolve_default_checkpoint(args.checkpoint_dir, args.model)
    if ckpt is not None and args.checkpoint_dir is None:
        print(f"Using committed trained checkpoint: {ckpt}", file=sys.stderr)

    from adx_tpu.serving import serve

    serve(
        model=args.model,
        checkpoint_dir=ckpt,
        host=args.host,
        port=args.port,
        max_batch=args.max_batch,
        batch_window_ms=args.batch_window_ms,
        explain=args.explain,
        explain_batch_window_ms=args.explain_batch_window_ms,
        explain_max_batch=args.explain_max_batch,
        warm_batches=args.warm_batches,
    )


if __name__ == "__main__":
    main()
