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
    pat = re.compile(r"\.filter\(\s*lambda")
    hits = []
    for p in sorted(PKG.rglob("*.py")):
        for i, line in enumerate(p.read_text().splitlines(), 1):
            # pa.Table.filter / pd.filter take masks, not per-row
            # lambdas; any `.filter(lambda` is the Dataset row form.
            if pat.search(line):
                hits.append(f"{p.relative_to(PKG.parent)}:{i}: {line.strip()}")
    assert not hits, "row-lambda Dataset.filter in hot path:\n" + "\n".join(hits)
