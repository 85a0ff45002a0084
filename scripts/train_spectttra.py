#!/usr/bin/env python
"""Fine-tune SpecTTTra on a dataset-folder tree (REAL vs generated).

A capability the reference lacks entirely (it consumes a frozen external
checkpoint — SURVEY.md §2.1): data-parallel × tensor-parallel training over
a device mesh, with orbax checkpointing so fine-tuned detectors feed
straight back into the explainers.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

import jax
import jax.numpy as jnp

from adx_tpu.models.config import resolve_preset, tiny_test_config
from adx_tpu.parallel.mesh import training_mesh
from adx_tpu.training.data import batch_iterator, scan_dataset, train_val_split
from adx_tpu.training.train import evaluate, make_eval_step, make_train_step


def main():
    ap = argparse.ArgumentParser(description="Fine-tune SpecTTTra")
    ap.add_argument("--dataset", required=True, help="Dataset root (folder per generator)")
    ap.add_argument("--model", default="spectttra-alpha-120s")
    ap.add_argument("--init-checkpoint", default=None, help="Converted checkpoint dir")
    ap.add_argument("--out", default="checkpoints/spectttra_finetuned")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--warmup-steps", type=int, default=100,
                    help="linear LR warmup, then cosine decay over --steps")
    ap.add_argument("--clip-norm", type=float, default=1.0,
                    help="global-norm gradient clip (0 disables)")
    ap.add_argument("--val-fraction", type=float, default=0.1,
                    help="stratified held-out fraction (0 disables eval)")
    ap.add_argument("--eval-every", type=int, default=100)
    ap.add_argument("--tp", type=int, default=1, help="tensor-parallel size")
    ap.add_argument("--save-every", type=int, default=200)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument(
        "--device-cache", choices=["auto", "on", "off"], default="auto",
        help="Keep the whole training set resident in HBM as int16 and "
             "gather batches inside the jitted step (zero per-step H2D; "
             "'auto' enables it when the dataset fits in ~4 GB)")
    args = ap.parse_args()

    # resolve the model config BEFORE building the train step: a converted
    # checkpoint's config.json is authoritative (it may differ from the
    # --model preset in duration/n_fft/arch — building step_fn from the
    # preset and then swapping cfg would train a mismatched model, and
    # opt_state would be init'd against the wrong params)
    params = None
    if args.init_checkpoint:
        from adx_tpu.models.convert import load_torch_checkpoint

        cfg, params = load_torch_checkpoint(args.init_checkpoint)
    else:
        cfg = (tiny_test_config() if args.model in ("tiny", "spectttra-tiny")
               else resolve_preset(args.model))
    n_dev = len(jax.devices())
    mesh = training_mesh(n_data=n_dev // args.tp, n_model=args.tp)
    print(f"Mesh: {dict(mesh.shape)} over {n_dev} devices")

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    init_fn, step_fn, shard_state = make_train_step(
        cfg, mesh, learning_rate=args.lr, dtype=dtype,
        total_steps=args.steps, warmup_steps=args.warmup_steps,
        clip_norm=args.clip_norm or None,
    )

    sample = jnp.zeros((1, cfg.audio.n_samples), jnp.float32)
    state = init_fn(jax.random.key(0), sample)
    if params is not None:
        state = state._replace(params=params)
    state = shard_state(state)

    items = scan_dataset(args.dataset)
    train_items, val_items = train_val_split(
        items, val_fraction=args.val_fraction
    )
    print(f"Dataset: {len(items)} files ({len(train_items)} train / "
          f"{len(val_items)} val)")
    cache_bytes = len(train_items) * cfg.audio.n_samples * 2
    if len(train_items) < args.batch_size:
        # fewer files than one batch: cached_batches would spin forever
        # yielding nothing (and batch_iterator now raises for the same)
        sys.exit(
            f"❌ {len(train_items)} training files < --batch-size "
            f"{args.batch_size}; lower the batch size"
        )
    use_cache = args.device_cache == "on" or (
        args.device_cache == "auto" and 0 < cache_bytes <= 4 << 30
    )
    if use_cache:
        from adx_tpu.training.train import upload_device_cache

        print(f"Uploading device-resident dataset: {len(train_items)} tracks "
              f"({cache_bytes / 1e6:.0f} MB int16, one-time H2D)…")
        host_batches = batch_iterator(
            train_items, len(train_items), cfg.audio.n_samples,
            cfg.audio.sample_rate, shuffle=False, epochs=1,
        )
        all_data = next(host_batches)
        cache = upload_device_cache(mesh, all_data["wave"], all_data["label"])
        rng = np.random.default_rng(0)

        def cached_batches():
            while True:
                order = rng.permutation(len(train_items))
                for lo in range(0, len(order) - args.batch_size + 1,
                                args.batch_size):
                    yield order[lo: lo + args.batch_size]

        batches = cached_batches()
    else:
        batches = batch_iterator(
            train_items, args.batch_size, cfg.audio.n_samples,
            cfg.audio.sample_rate,
        )
    eval_fn = make_eval_step(cfg, mesh, dtype=dtype) if val_items else None
    val_cache: list = []  # decode the val set ONCE (host decode+resample of
    # 120 s tracks costs ~2 s each — re-paying it every eval stalls the chip)

    def run_eval(params):
        if not val_cache:
            val_cache.extend(batch_iterator(
                val_items, min(args.batch_size, len(val_items)),
                cfg.audio.n_samples, cfg.audio.sample_rate,
                shuffle=False, epochs=1, drop_last=False,
            ))
        return evaluate(eval_fn, params, val_cache)

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    t0 = time.time()
    losses = []
    step_done = []  # wall clock after each step's loss sync (float() is a D2H)
    best_val = float("inf")
    for step, batch in enumerate(batches):
        if step >= args.steps:
            break
        if use_cache:
            state, loss = step_fn.cached(state, cache.waves_i16,
                                         cache.labels,
                                         np.asarray(batch, np.int32))
        else:
            state, loss = step_fn(state, batch["wave"], batch["label"])
        losses.append(float(loss))
        step_done.append(time.time())
        if step % 10 == 0:
            rate = (step + 1) * args.batch_size / (time.time() - t0)
            print(f"step {step:5d}  loss {np.mean(losses[-10:]):.4f}  {rate:.1f} ex/s")
        if eval_fn and ((step + 1) % args.eval_every == 0 or step + 1 == args.steps):
            metrics = run_eval(state.params)
            flag = ""
            if metrics["loss"] < best_val:
                best_val = metrics["loss"]
                _save_checkpoint(state, out_dir / "best")
                flag = "  💾 best"
            print(f"  eval @ {step+1}: " + "  ".join(
                f"{k}={v:.4f}" if isinstance(v, float) else f"{k}={v}"
                for k, v in metrics.items()) + flag)
        if (step + 1) % args.save_every == 0 or step + 1 == args.steps:
            _save_checkpoint(state, out_dir / f"step_{step+1:06d}")
    print(f"Done: {len(losses)} steps, final loss {np.mean(losses[-10:]):.4f}")
    if len(step_done) > 2:
        # Steady state excludes step 0 (compile) and any step whose wall
        # time includes an eval/checkpoint pause (median is robust to those).
        dt = float(np.median(np.diff(step_done)))
        # Train FLOPs ≈ 3× forward (fwd + 2× bwd) on the encoder stack —
        # same analytic MAC count as bench.py's MFU floor.
        m = cfg.model
        d_ff = int(m.embed_dim * m.mlp_ratio)
        macs = (4 * cfg.n_tokens * m.embed_dim ** 2
                + 2 * cfg.n_tokens ** 2 * m.embed_dim
                + 2 * cfg.n_tokens * m.embed_dim * d_ff) * m.num_layers
        train_tflops = 3 * 2 * macs * args.batch_size / 1e12
        print(f"steady-state: {dt * 1e3:.0f} ms/step, "
              f"{args.batch_size / dt:.2f} ex/s, "
              f"~{train_tflops / dt:.1f} TF/s "
              f"({100 * train_tflops / dt / 197.0:.1f}% of v5e bf16 peak)")


def _save_checkpoint(state, path: Path):
    import orbax.checkpoint as ocp

    ckpt_path = path.absolute()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(ckpt_path, jax.device_get(state.params), force=True)
    ckptr.wait_until_finished()
    print(f"💾 Saved checkpoint: {ckpt_path}")


if __name__ == "__main__":
    main()
