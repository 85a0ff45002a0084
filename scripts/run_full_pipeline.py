#!/usr/bin/env python
"""One-process pipeline orchestrator: chain stage runners without paying
per-process TPU boot.

The reference's workflow is a chain of separate CLI invocations
(predictions → FBP/occlusion/LIME experiments → feature extraction →
visualizations; readme.md:60-126). Running each as its own process is
correct but expensive on tunneled TPU runtimes: every process pays the
backend first-touch/grant wait (measured 1.8-8.6 min per process) plus
re-tracing of every jitted sweep program. This orchestrator runs the same
stage scripts **in one process** via runpy — the predictor is shared
through ``adx_tpu.io.config.build_predictor``'s memo, engines through
``adx_tpu.runtime.engine.cached_engine``, and XLA programs stay traced —
so only the first stage pays the boot cost.

Pipeline config (YAML):

    stages:
      - name: predictions                 # display label
        script: scripts/run_sonics_predictions.py
        config: /path/to/sonics.yaml      # passed as --config
        args: []                          # extra CLI args
        allow_exit_codes: [0]             # e.g. [0, 1] for audio-only arms
                                          # (they exit 1 "No results
                                          # generated!" by reference parity)

Each stage runs with its own sys.argv exactly as if invoked standalone;
SystemExit is caught and checked against allow_exit_codes. A failing stage
aborts the pipeline (matching `set -e` shell behavior).
"""

from __future__ import annotations

import argparse
import runpy
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

from adx_tpu.io.config import load_yaml


def run_stage(script: str, argv: list) -> tuple:
    """Execute a runner script in-process; returns (rc, seconds).

    rc 130 means the stage was interrupted (Ctrl+C — the runners exit 130 on
    KeyboardInterrupt); callers must abort the chain, never tolerate it."""
    script_path = Path(script)
    if not script_path.is_absolute():
        script_path = ROOT / script_path
    old_argv = sys.argv
    sys.argv = [str(script_path)] + [str(a) for a in argv]
    t0 = time.time()
    rc = 0
    try:
        runpy.run_path(str(script_path), run_name="__main__")
    except SystemExit as e:
        code = e.code
        if code is not None and not isinstance(code, int):
            # `raise SystemExit("❌ message")` exits 1 with the message on
            # stderr under the normal interpreter — preserve the diagnostic
            print(code, file=sys.stderr)
        rc = code if isinstance(code, int) else (0 if code is None else 1)
    except KeyboardInterrupt:
        # Only some runners convert Ctrl+C to sys.exit(130) themselves, and
        # even those can be interrupted before their try block (e.g. during
        # the minutes-long TPU boot in build_predictor). Normalize here so
        # the chain's rc==130 abort + timing-ledger contract always holds.
        rc = 130
    finally:
        sys.argv = old_argv
    return rc, time.time() - t0


def main():
    ap = argparse.ArgumentParser(
        description="Run a chain of experiment/feature/vis stages in ONE process"
    )
    ap.add_argument("--config", required=True, help="Pipeline YAML (stages: [...])")
    ap.add_argument(
        "--from-stage", default=None,
        help="Skip stages before this name (resume a partial run)",
    )
    ap.add_argument(
        "--skip-vis", action="store_true",
        help="Results-only sweep: skip visualization stages (kind: vis, or "
             "script names containing 'vis'). Matplotlib rendering on the "
             "1-core host is the measured largest cost of a full sweep; the "
             "vis stages are pure post-processing of the result JSONs and "
             "can be re-run later with --only-vis.",
    )
    ap.add_argument(
        "--only-vis", action="store_true",
        help="Render-only: run just the visualization stages against "
             "results produced by an earlier --skip-vis sweep.",
    )
    cli = ap.parse_args()
    if cli.skip_vis and cli.only_vis:
        print("❌ --skip-vis and --only-vis are mutually exclusive")
        sys.exit(2)

    cfg = load_yaml(Path(cli.config))
    stages = cfg.get("stages", [])
    if not stages:
        print("⚠️  Pipeline config has no stages")
        sys.exit(1)

    names = [st.get("name") or Path(st["script"]).stem for st in stages]
    if cli.from_stage is not None and cli.from_stage not in names:
        print(f"❌ --from-stage {cli.from_stage!r} is not a configured stage; "
              f"choices: {', '.join(names)}")
        sys.exit(1)

    started = cli.from_stage is None
    timings = []
    for st in stages:
        name = st.get("name") or Path(st["script"]).stem
        if not started:
            if name == cli.from_stage:
                started = True
            else:
                print(f"⏭️  Skipping stage: {name}")
                continue
        # vis stages: tagged `kind: vis` in the config, with a name-based
        # fallback (all reference vis runners carry 'vis' in the filename)
        is_vis = (st.get("kind") == "vis"
                  or "vis" in Path(st["script"]).stem.lower())
        if (cli.skip_vis and is_vis) or (cli.only_vis and not is_vis):
            print(f"⏭️  Skipping {'vis' if is_vis else 'results'} stage: {name}")
            continue
        argv = []
        if st.get("config"):
            # relative stage configs resolve against the repo ROOT like
            # script/expect_glob paths do — NOT the caller's CWD
            cfg_path = Path(st["config"])
            if not cfg_path.is_absolute():
                cfg_path = ROOT / cfg_path
            argv += ["--config", str(cfg_path)]
        argv += list(st.get("args", []))
        allow = tuple(st.get("allow_exit_codes", (0,)))
        print(f"\n{'=' * 70}\n🚀 Stage: {name}  ({Path(st['script']).name} {' '.join(map(str, argv))})\n{'=' * 70}",
              flush=True)
        t_stage = time.time()
        rc, secs = run_stage(st["script"], argv)
        timings.append((name, rc, secs))
        if rc == 130:
            # an interrupted stage must stop the chain even when the stage
            # tolerates nonzero exits — running the remaining stages against
            # a partial result tree reports "complete" on silently bad data
            print(f"\n⚠️  Pipeline interrupted at stage {name}")
            _print_summary(timings)
            sys.exit(130)
        ok = rc in allow
        # allow_exit_codes beyond 0 exist for the audio-only arms, which
        # exit 1 "No results generated!" by reference parity — but that
        # same exit also covers genuine failures. expect_glob declares the
        # artifact the stage MUST have produced; a tolerated rc with a
        # missing artifact is a real failure.
        if ok and st.get("expect_glob"):
            import glob as _glob
            import os as _os

            # resolve relative globs against the CWD: the stage scripts
            # create their result trees from the config's relative
            # result_path against the CWD (not the repo ROOT), so the
            # artifact check must look where the stages actually write.
            # (script/config paths, by contrast, are repo files and resolve
            # against ROOT.)
            pat = st["expect_glob"]
            hits = _glob.glob(pat, recursive=True)
            if not hits:
                ok = False
                print(f"❌ Stage {name}: expected artifact missing "
                      f"({st['expect_glob']})")
            elif all(_os.path.getmtime(h) < t_stage - 1.0 for h in hits):
                # Every match predates this stage's start. Legitimate when
                # the stage resumed from a checkpoint and skipped all files,
                # but it also masks a tolerated-rc stage that failed before
                # producing anything — surface it instead of failing, since
                # checkpoint resume makes old artifacts valid.
                print(f"⚠️  Stage {name}: all artifacts matching "
                      f"{st['expect_glob']} predate the stage start — "
                      f"checkpoint resume, or a stale tree from an earlier "
                      f"run masking a failure")
        status = "✅" if ok else "❌"
        print(f"{status} Stage {name}: rc={rc} in {secs:.1f} s", flush=True)
        if not ok:
            print(f"\n❌ Pipeline aborted at stage {name} (rc={rc})")
            _print_summary(timings)
            sys.exit(1)

    _print_summary(timings)
    print("\n✅ Pipeline complete")


def _print_summary(timings):
    print("\n📊 Stage summary:")
    for name, rc, secs in timings:
        print(f"   {name:30s} rc={rc}  {secs:8.1f} s")
    total = sum(s for _, _, s in timings)
    print(f"   {'TOTAL':30s}        {total:8.1f} s")


if __name__ == "__main__":
    main()
