"""Source-hygiene lints for scale-path rules the repo has adopted.

``Dataset.filter(lambda ...)`` invokes a Python predicate per ROW over
the whole table — at 10^10 edges/pages that single line dominates the
stage (VERDICT r3 item 3). Every filter in the hot path must be a
vectorized ``map_batches`` Arrow/pandas mask instead; this lint keeps
the rule enforced going forward.
"""

import pathlib
import re

PKG = pathlib.Path(__file__).resolve().parent.parent / "gleaner_ray"


def test_no_row_lambda_dataset_filter():
    # \s matches newlines, and the search runs over the WHOLE file text
    # so a formatter-wrapped call ('.filter(' newline 'lambda r: ...')
    # cannot slip past a line-wise scan. pa.Table.filter / pd.filter
    # take masks, not per-row lambdas; any `.filter(lambda` (however
    # wrapped) is the Dataset row form.
    pat = re.compile(r"\.filter\(\s*lambda")
    hits = []
    for p in sorted(PKG.rglob("*.py")):
        text = p.read_text()
        for m in pat.finditer(text):
            line = text.count("\n", 0, m.start()) + 1
            hits.append(f"{p.relative_to(PKG.parent)}:{line}")
    assert not hits, "row-lambda Dataset.filter in hot path:\n" + "\n".join(hits)


def test_filter_lambda_lint_catches_wrapped_call():
    # the lint must flag the black-wrapped form it previously missed
    sample = "ds = ds.filter(\n    lambda r: r['x'] > 0\n)\n"
    pat = re.compile(r"\.filter\(\s*lambda")
    assert pat.search(sample)
