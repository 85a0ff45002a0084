#!/usr/bin/env python
"""Regenerate the golden regression tree (tests/goldens/).

Run AFTER reviewing why values moved, in the tests' CPU-mesh env:

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python scripts/make_goldens.py

and commit the goldens diff together with the numerics change, noting why.
See tests/golden_utils.py for what the tree pins.
"""

from __future__ import annotations

import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
for p in (str(ROOT), str(ROOT / "tests")):
    if p not in sys.path:
        sys.path.insert(0, p)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    if len(jax.devices("cpu")) < 8:
        print("ERROR: run with XLA_FLAGS=--xla_force_host_platform_device_count=8 "
              "PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu — the goldens must be "
              "generated on the same CPU×8 mesh the tests use")
        sys.exit(2)
    import golden_utils

    dst = ROOT / "tests" / "goldens"
    golden_utils.generate_tree(dst)
    print(f"\n✅ goldens regenerated under {dst} — review `git diff` and commit "
          f"with a note explaining the numerics move")


if __name__ == "__main__":
    main()
