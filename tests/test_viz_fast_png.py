"""The fast-PNG savefig default (adx_tpu/viz/__init__.py): pixel-identical
output, honoring explicit caller pil_kwargs, and the opt-out env var."""

import os

import numpy as np
import pytest

matplotlib = pytest.importorskip("matplotlib")
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

import adx_tpu.viz  # noqa: F401, E402 — installs the wrapper


def _fig():
    rng = np.random.default_rng(0)
    fig, ax = plt.subplots(figsize=(6, 4))
    im = ax.imshow(rng.standard_normal((32, 128)), aspect="auto", cmap="magma")
    fig.colorbar(im, ax=ax)
    return fig


def test_fast_png_pixels_identical(tmp_path):
    from PIL import Image

    fig = _fig()
    fast = tmp_path / "fast.png"
    slow = tmp_path / "slow.png"
    fig.savefig(fast, dpi=150, bbox_inches="tight")
    # explicit pil_kwargs wins over the default (max compression here)
    fig.savefig(slow, dpi=150, bbox_inches="tight",
                pil_kwargs={"compress_level": 9})
    plt.close(fig)
    a = np.asarray(Image.open(fast))
    b = np.asarray(Image.open(slow))
    np.testing.assert_array_equal(a, b)  # PNG is lossless at every level
    assert fast.stat().st_size >= slow.stat().st_size  # level 1 ≥ level 9 bytes


def test_fast_png_wrapper_installed_once_and_unwrappable():
    import matplotlib.figure as mfig

    assert getattr(mfig.Figure.savefig, "_adx_fast_png", False)
    orig = mfig.Figure.savefig.__wrapped__
    # calling the installer again must not stack a second wrapper
    from adx_tpu.viz import _enable_fast_png

    _enable_fast_png()
    assert mfig.Figure.savefig.__wrapped__ is orig


def test_fast_png_non_png_paths_untouched(tmp_path):
    # PDF output takes the unmodified path (pil_kwargs would be rejected)
    fig = _fig()
    out = tmp_path / "x.pdf"
    fig.savefig(out)
    plt.close(fig)
    assert out.stat().st_size > 0
