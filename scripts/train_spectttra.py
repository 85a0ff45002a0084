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
from adx_tpu.training.data import batch_iterator, scan_dataset
from adx_tpu.training.train import make_train_step


def main():
    ap = argparse.ArgumentParser(description="Fine-tune SpecTTTra")
    ap.add_argument("--dataset", required=True, help="Dataset root (folder per generator)")
    ap.add_argument("--model", default="spectttra-alpha-120s")
    ap.add_argument("--init-checkpoint", default=None, help="Converted checkpoint dir")
    ap.add_argument("--out", default="checkpoints/spectttra_finetuned")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--tp", type=int, default=1, help="tensor-parallel size")
    ap.add_argument("--save-every", type=int, default=200)
    ap.add_argument("--bf16", action="store_true")
    args = ap.parse_args()

    cfg = tiny_test_config() if args.model in ("tiny", "spectttra-tiny") else resolve_preset(args.model)
    n_dev = len(jax.devices())
    mesh = training_mesh(n_data=n_dev // args.tp, n_model=args.tp)
    print(f"Mesh: {dict(mesh.shape)} over {n_dev} devices")

    init_fn, step_fn, shard_state = make_train_step(
        cfg, mesh, learning_rate=args.lr,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
    )

    sample = jnp.zeros((1, cfg.audio.n_samples), jnp.float32)
    if args.init_checkpoint:
        from adx_tpu.models.convert import load_torch_checkpoint

        cfg, params = load_torch_checkpoint(args.init_checkpoint)
        state = init_fn(jax.random.key(0), sample)
        state = state._replace(params=params)
    else:
        state = init_fn(jax.random.key(0), sample)
    state = shard_state(state)

    items = scan_dataset(args.dataset)
    print(f"Dataset: {len(items)} files")
    batches = batch_iterator(
        items, args.batch_size, cfg.audio.n_samples, cfg.audio.sample_rate
    )

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    t0 = time.time()
    losses = []
    for step, batch in enumerate(batches):
        if step >= args.steps:
            break
        state, loss = step_fn(state, batch["wave"], batch["label"])
        losses.append(float(loss))
        if step % 10 == 0:
            rate = (step + 1) * args.batch_size / (time.time() - t0)
            print(f"step {step:5d}  loss {np.mean(losses[-10:]):.4f}  {rate:.1f} ex/s")
        if (step + 1) % args.save_every == 0 or step + 1 == args.steps:
            import orbax.checkpoint as ocp

            ckpt_path = (out_dir / f"step_{step+1:06d}").absolute()
            ckptr = ocp.StandardCheckpointer()
            ckptr.save(ckpt_path, jax.device_get(state.params))
            ckptr.wait_until_finished()
            print(f"💾 Saved checkpoint: {ckpt_path}")
    print(f"Done: {len(losses)} steps, final loss {np.mean(losses[-10:]):.4f}")


if __name__ == "__main__":
    main()
