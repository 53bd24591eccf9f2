"""tools/port_torch_checkpoint.py end-to-end: .pth -> npz -> load."""

import os
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "models")),
    reason="reference checkout not available")


def test_port_cli_roundtrip(tmp_path):
    sys.path.insert(0, REF)
    import importlib

    ref_mod = importlib.import_module("models.pointnet2_sem_seg")
    torch.manual_seed(0)
    ref = ref_mod.get_model(8, 0)
    ckpt = str(tmp_path / "best_model.pth")
    torch.save({"epoch": 3, "model_state_dict": ref.state_dict()}, ckpt)

    out = str(tmp_path / "ported.npz")
    env = dict(os.environ, PYTHONPATH="/root/repo")
    r = subprocess.run(
        [sys.executable, "/root/repo/tools/port_torch_checkpoint.py", ckpt,
         out, "--model", "pointnet2_sem_seg"],
        capture_output=True, text=True, env=env, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    data = np.load(out)
    keys = list(data.keys())
    assert any("sa1" in k and "conv" in k for k in keys)
    assert any("batch_stats" in k for k in keys)
    # conv kernels transposed to [in, out]
    w = [data[k] for k in keys if "sa1" in k and k.endswith("w")][0]
    assert w.shape[0] in (9, 12)  # in_channel first
