"""scripts/visualize.py — the reference's qualitative similarity/influence
figures (``figs/*.png``) as one command against the live NW head."""

import importlib.util
import os

import numpy as np


def test_visualize_panels_smoke(tmp_path):
    spec = importlib.util.spec_from_file_location(
        "visualize",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "visualize.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = str(tmp_path / "panels.png")
    got = mod.main([
        "--dataset", "synthetic", "--arch", "resnet10",
        "--n_shot_full", "5", "--n_queries", "2", "--topk", "3",
        "--out", out,
    ])
    assert got == out
    assert os.path.getsize(out) > 10_000  # a real rendered figure
    # PNG magic — matplotlib actually wrote an image, not an empty file.
    with open(out, "rb") as f:
        assert f.read(8) == b"\x89PNG\r\n\x1a\n"
