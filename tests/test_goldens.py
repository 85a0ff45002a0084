"""Golden regression gate (VERDICT r3 item 5): regenerate the tiny result
tree on the CPU test mesh and compare it to the checked-in goldens exactly
(after path normalization). Any numerics drift — a changed kernel, a new
default, a dependency bump — fails here until the goldens are deliberately
regenerated (see golden_utils docstring for the refresh procedure)."""

from pathlib import Path

import pytest

import golden_utils

GOLDEN_DIR = Path(__file__).parent / "goldens"


@pytest.mark.slow
def test_golden_tree_matches(tmp_path):
    if not GOLDEN_DIR.exists():
        pytest.fail(
            "tests/goldens/ missing — generate it once with "
            "scripts/make_goldens.py (see golden_utils docstring)"
        )
    golden_utils.generate_tree(tmp_path)
    problems = golden_utils.diff_trees(GOLDEN_DIR, tmp_path)
    assert not problems, (
        "golden tree drift (first 40 shown):\n  "
        + "\n  ".join(problems[:40])
        + "\n\nIf this change is intentional, regenerate with "
          "scripts/make_goldens.py and commit the goldens diff with a note."
    )
