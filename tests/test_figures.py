"""Smoke test for the three reference figure artifacts (VERDICT r4 item 7:
reference fig/tsp_trend.png, OHBM_DEMO.ipynb cell 56,
HL-HGAT-DEMO/lib/Hodge_Dataset.py:53-107 plt_sort_anatomy)."""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)))
)


def test_figures_render(tmp_path):
    from examples.figures import main

    outs = main(["--out_dir", str(tmp_path)])
    assert len(outs) == 3
    names = {os.path.basename(o) for o in outs}
    assert names == {
        "tsp_trend.png", "cifar_attention.png", "brain_fc_attention.png"
    }
    for o in outs:
        assert os.path.isfile(o) and os.path.getsize(o) > 10_000, o
