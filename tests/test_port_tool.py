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


def test_export_roundtrip_into_reference_model(tmp_path):
    """tumseg init -> export_state_dict -> torch reference load ->
    forward parity. Proves TPU-trained weights load in the reference."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, REF)
    sys.path.insert(0, os.path.join(REF, "models"))
    import importlib

    from tools.export_torch_checkpoint import export_state_dict
    from tumseg import models as tmodels

    mine = tmodels.get_module("pointnet_sem_seg")
    var = mine.init(jax.random.PRNGKey(1), 8, 0)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_state_dict(
              jax.tree_util.tree_map(np.asarray, var),
              "pointnet_sem_seg").items()}

    ref_mod = importlib.import_module("pointnet_sem_seg")
    ref = ref_mod.get_model(8, 0)
    ref.load_state_dict(sd)  # raises on any missing/unexpected key
    ref.eval()

    r = np.random.default_rng(9)
    x = r.random((1, 256, 6)).astype(np.float32)
    with torch.no_grad():
        ref_out, _ = ref(torch.from_numpy(x).transpose(2, 1))
    got, _, _ = mine.apply(var, jnp.asarray(x), training=False)
    np.testing.assert_allclose(np.asarray(got), ref_out.numpy(), atol=2e-3)


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
