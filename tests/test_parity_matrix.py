"""PARITY.md drift gate: every reference @Test must be accounted for and
the committed matrix must match the generator's output (VERDICT r5 item 3
— the same enforcement pattern as the PLANS.md digest test)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.parity_matrix import REPO, build_matrix, render


def test_every_reference_test_is_accounted():
    rows, missing = build_matrix()
    assert not missing, f"unaccounted reference tests: {missing}"
    assert len(rows) >= 340  # the reference's suite size at port time


def test_parity_md_is_current():
    rows, missing = build_matrix()
    assert not missing
    path = os.path.join(REPO, "PARITY.md")
    assert os.path.exists(path), "PARITY.md missing — run tools/parity_matrix.py"
    assert open(path).read() == render(rows), (
        "PARITY.md is stale — run: python tools/parity_matrix.py"
    )


def test_ported_citations_resolve():
    # every explicitly-curated 'ported' row must point at a real pytest
    import re

    from tools.parity_matrix import DISPOSITIONS

    for (f, n), (status, where) in DISPOSITIONS.items():
        if status != "ported":
            continue
        for m in re.finditer(r"(tests/[\w./]+\.py)(?:::(\w+))?", where):
            path, func = m.group(1), m.group(2)
            full = os.path.join(REPO, path)
            assert os.path.exists(full), f"{f}::{n} cites missing file {path}"
            if func:
                assert f"def {func}(" in open(full).read(), (
                    f"{f}::{n} cites missing test {path}::{func}"
                )
