"""Execute the interpolation notebook's code cells end-to-end against the
shipped pretrained checkpoints (the reference's second entry point)."""

import json
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_notebook_executes(monkeypatch):
    monkeypatch.chdir(REPO)
    if not os.path.isfile("pretrained_models/mnist_digit/vae-model.msgpack"):
        pytest.skip("pretrained checkpoints not present")
    nb = json.load(open("latent-space-interpolation-mnist.ipynb"))
    cells = [("".join(c["source"]), i)
             for i, c in enumerate(nb["cells"]) if c["cell_type"] == "code"]
    g = {}
    for src, i in cells:
        exec(compile(src, f"<cell {i}>", "exec"), g)
    # the SLP optimisation improved likelihood over the straight line
    hist = g["hist"]
    assert float(hist["neg_ll"][-1]) < float(hist["neg_ll"][0])
    # artifacts written
    rdir = g["config"]["result_dir"]
    assert any(f.startswith("interpolated_image")
               for f in os.listdir(rdir))
