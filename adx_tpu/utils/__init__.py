"""Evaluation and miscellaneous utilities."""

from adx_tpu.utils.eval import (
    draw_spectro,
    run_inference,
    plot_classification_report,
    plot_roc_curve,
)
