"""Visualization / reporting layer (host-side matplotlib, CPU).

Importing this package turns on *fast PNG writes*: ``Figure.savefig`` for
``.png`` targets defaults to zlib ``compress_level=1`` (via Pillow) unless
the caller passes ``pil_kwargs`` explicitly.  PNG is lossless, so the
rendered pixels are bit-identical to matplotlib's default (verified by
``tests/test_viz_fast_png.py``); only the file is a few percent larger.
Measured on the 1-core pipeline host this cuts ``savefig`` time ~25%
(0.69 → 0.51 s on a 4-panel saliency-scale figure), and matplotlib PNG
rendering is the measured largest cost of the 15-stage sweep
(CLAUDE.md: 1069 PNGs ≈ 407 s).  Opt out with ``ADX_TPU_FAST_PNG=0``.
"""

import os as _os


def _enable_fast_png() -> None:
    if _os.environ.get("ADX_TPU_FAST_PNG", "1") == "0":
        return
    try:
        import matplotlib.figure as _mfig
        import PIL  # noqa: F401 — pil_kwargs needs Pillow; keep default without it
    except Exception:
        return
    orig = getattr(_mfig.Figure.savefig, "__wrapped__", None) or _mfig.Figure.savefig
    if getattr(_mfig.Figure.savefig, "_adx_fast_png", False):
        return

    def savefig(self, fname, *args, **kwargs):
        try:
            name = _os.fspath(fname)
        except TypeError:
            name = ""
        if isinstance(name, str) and name.lower().endswith(".png"):
            kwargs.setdefault("pil_kwargs", {"compress_level": 1})
        return orig(self, fname, *args, **kwargs)

    savefig._adx_fast_png = True
    savefig.__wrapped__ = orig
    _mfig.Figure.savefig = savefig


_enable_fast_png()
