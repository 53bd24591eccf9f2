"""Golden parity tests against the PyTorch reference implementation.

These build the reference model (imported from /root/reference, read-only),
port its randomly-initialized state_dict through
tools.port_torch_checkpoint.port_state_dict, and verify our TPU-native
forward produces the same log-probabilities on the same input — proving the
"same weights -> same predictions" contract that underpins mIoU parity.

Skipped automatically when torch or the reference checkout is unavailable.
"""

import os
import sys

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

REF = "/root/reference"
torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "models")),
    reason="reference checkout not available")

sys.path.insert(0, REF)
sys.path.insert(0, os.path.join(REF, "models"))

from tools.port_torch_checkpoint import port_state_dict  # noqa: E402
from tumseg import models  # noqa: E402


@pytest.fixture(autouse=True)
def _tpu_highest_matmul_precision():
    """On TPU the default f32 matmul precision is bf16-grade (one MXU pass),
    which breaks these 1e-4-rtol comparisons against torch's true-f32 CPU
    matmuls (hardware-suite run 2026-08-19: max|Δ| 1.4e-4 forward, 1.8e-3
    MSG). HIGHEST (3-pass bf16 composition) restores f32-grade products.
    No-op on the CPU test platform, so cached executables stay valid."""
    if jax.default_backend() == "cpu":
        yield
        return
    with jax.default_matmul_precision("highest"):
        yield


def _deterministic_randint(monkeypatch):
    """Pin the reference's stochastic FPS start (torch.randint) to 0 so both
    sides pick identical centroids."""
    real = torch.randint

    def fake(low, high, size, **kw):
        if low == 0 and len(size) == 1:  # the FPS start draw
            return torch.zeros(size, dtype=kw.get("dtype", torch.long))
        return real(low, high, size, **kw)

    monkeypatch.setattr(torch, "randint", fake)


@pytest.mark.parametrize("extra", [0, 3])
def test_pointnet2_forward_parity(monkeypatch, extra):
    _deterministic_randint(monkeypatch)
    import importlib

    ref_mod = importlib.import_module("models.pointnet2_sem_seg")
    torch.manual_seed(0)
    ref = ref_mod.get_model(8, extra).eval()

    variables = port_state_dict(ref.state_dict(), "pointnet2_sem_seg")
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    mine = models.get_module("pointnet2_sem_seg")

    r = np.random.default_rng(0)
    x = r.random((1, 2048, 6 + extra)).astype(np.float32)

    with torch.no_grad():
        ref_out, _ = ref(torch.from_numpy(x).transpose(2, 1))
    got, _, _ = mine.apply(variables, jnp.asarray(x), training=False)

    ref_np = ref_out.numpy()
    got_np = np.asarray(got)
    # identical predictions everywhere
    assert (got_np.argmax(-1) == ref_np.argmax(-1)).mean() > 0.999
    np.testing.assert_allclose(got_np, ref_np, atol=2e-3)


@pytest.mark.parametrize("extra", [0, 3])
def test_pointnet_forward_parity(extra):
    import importlib

    ref_mod = importlib.import_module("pointnet_sem_seg")
    torch.manual_seed(0)
    ref = ref_mod.get_model(8, extra).eval()

    variables = port_state_dict(ref.state_dict(), "pointnet_sem_seg")
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    mine = models.get_module("pointnet_sem_seg")

    r = np.random.default_rng(1)
    x = r.random((2, 1024, 6 + extra)).astype(np.float32)

    with torch.no_grad():
        ref_out, ref_tf = ref(torch.from_numpy(x).transpose(2, 1))
    got, got_tf, _ = mine.apply(variables, jnp.asarray(x), training=False)

    np.testing.assert_allclose(np.asarray(got_tf), ref_tf.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got), ref_out.numpy(), atol=2e-3)
    assert (np.asarray(got).argmax(-1) == ref_out.numpy().argmax(-1)).all()


def test_msg_set_abstraction_parity(monkeypatch):
    """set_abstraction_msg matches the reference PointNetSetAbstractionMsg
    (/root/reference/models/pointnet2_utils.py:205-262) with ported weights:
    same FPS centroids (start pinned), per-radius grouping, channel order
    [points, centered xyz], per-scale MLP + K-max, scale concat."""
    _deterministic_randint(monkeypatch)
    import importlib

    from tools.port_torch_checkpoint import _mlp_stack
    from tumseg.nn import layers as L

    utils = importlib.import_module("models.pointnet2_utils")
    torch.manual_seed(11)
    npoint, radius_list, nsample_list = 128, [0.1, 0.2], [8, 16]
    in_channel, mlp_list = 6, [[16, 32], [16, 32]]
    ref = utils.PointNetSetAbstractionMsg(
        npoint, radius_list, nsample_list, in_channel, mlp_list).eval()

    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, stats = [], []
    for i in range(len(mlp_list)):
        p, s = _mlp_stack(state, f"conv_blocks.{i}", f"bn_blocks.{i}")
        params.append(p)
        stats.append(s)

    r = np.random.default_rng(3)
    B, N = 2, 512
    xyz = r.random((B, N, 3)).astype(np.float32)
    points = r.random((B, N, in_channel)).astype(np.float32)

    with torch.no_grad():
        ref_xyz, ref_out = ref(
            torch.from_numpy(xyz).transpose(2, 1),
            torch.from_numpy(points).transpose(2, 1))

    cfg = dict(npoint=npoint, radius_list=radius_list,
               nsample_list=nsample_list)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    stats = jax.tree_util.tree_map(jnp.asarray, stats)
    new_xyz, out, _ = L.set_abstraction_msg(
        params, stats, cfg, jnp.asarray(xyz), jnp.asarray(points),
        training=False, momentum=0.1)

    np.testing.assert_allclose(np.asarray(new_xyz),
                               ref_xyz.transpose(2, 1).numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out),
                               ref_out.transpose(2, 1).numpy(), atol=2e-4)


def test_pointnet2_gradient_parity(monkeypatch):
    """Same weights + same batch -> same parameter gradients (eval-mode BN,
    no dropout), proving the training dynamics match the reference."""
    _deterministic_randint(monkeypatch)
    import importlib

    ref_mod = importlib.import_module("models.pointnet2_sem_seg")
    torch.manual_seed(1)
    ref = ref_mod.get_model(8, 0).eval()

    variables = port_state_dict(ref.state_dict(), "pointnet2_sem_seg")
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    mine = models.get_module("pointnet2_sem_seg")

    r = np.random.default_rng(5)
    x = r.random((1, 2048, 6)).astype(np.float32)
    tgt = r.integers(0, 8, (1, 2048))
    w = np.ones(8, dtype=np.float32)

    # torch gradients
    tx = torch.from_numpy(x).transpose(2, 1)
    pred, _ = ref(tx)
    import torch.nn.functional as F

    tloss = F.nll_loss(pred.reshape(-1, 8), torch.from_numpy(tgt).reshape(-1),
                       weight=torch.from_numpy(w))
    tloss.backward()
    tgrads = {k: v.grad.detach().numpy() for k, v in
              ref.named_parameters() if v.grad is not None}

    # jax gradients
    def loss_fn(params):
        logp, aux, _ = mine.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            jnp.asarray(x), training=False)
        return mine.loss(logp, jnp.asarray(tgt), aux, jnp.asarray(w))

    jloss, jgrads = jax.value_and_grad(loss_fn)(variables["params"])
    np.testing.assert_allclose(float(jloss), float(tloss), rtol=1e-4)

    # compare a representative set of kernels across the network
    checks = [
        ("sa1.mlp_convs.0.weight", jgrads["sa1"][0]["conv"]["w"], True),
        ("sa4.mlp_convs.2.weight", jgrads["sa4"][2]["conv"]["w"], True),
        ("fp1.mlp_convs.0.weight", jgrads["fp1"][0]["conv"]["w"], True),
        ("conv2.weight", jgrads["conv2"]["w"], True),
        ("bn1.weight", jgrads["bn1"]["scale"], False),
    ]
    for tname, jg, is_conv in checks:
        tg = tgrads[tname]
        tg = tg.reshape(tg.shape[0], -1).T if is_conv else tg
        jg = np.asarray(jg)
        atol = max(2e-3 * float(np.abs(tg).max()), 1e-8)
        np.testing.assert_allclose(jg, tg, atol=atol, err_msg=tname)


def test_training_trajectory_parity(monkeypatch):
    """Same initial weights + same batch sequence -> the same loss
    trajectory as the reference's torch training loop (Adam, weighted NLL,
    train-mode BN; dropout disabled on both sides, FPS start pinned).
    This is the end-to-end 'training dynamics match' check."""
    _deterministic_randint(monkeypatch)
    import importlib

    import optax

    from tumseg.train import make_optimizer

    ref_mod = importlib.import_module("models.pointnet2_sem_seg")
    torch.manual_seed(3)
    ref = ref_mod.get_model(8, 0).train()
    ref.drop1.p = 0.0  # dropout masks are RNG-framework-specific

    variables = port_state_dict(ref.state_dict(), "pointnet2_sem_seg")
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    mine = models.get_module("pointnet2_sem_seg")

    r = np.random.default_rng(7)
    steps = 4
    B, N = 1, 1024
    batches = [(r.random((B, N, 6)).astype(np.float32),
                r.integers(0, 8, (B, N))) for _ in range(steps)]
    w = np.ones(8, dtype=np.float32)
    lr, wd = 1e-3, 1e-4

    # ---- torch trajectory ----
    import torch.nn.functional as F

    topt = torch.optim.Adam(ref.parameters(), lr=lr, betas=(0.9, 0.999),
                            eps=1e-8, weight_decay=wd)
    torch_losses = []
    for x, t in batches:
        topt.zero_grad()
        pred, _ = ref(torch.from_numpy(x).transpose(2, 1))
        loss = F.nll_loss(pred.reshape(-1, 8),
                          torch.from_numpy(t).reshape(-1),
                          weight=torch.from_numpy(w))
        loss.backward()
        topt.step()
        torch_losses.append(float(loss))

    # ---- tumseg trajectory ----
    tx = make_optimizer("Adam", weight_decay=wd)
    params = variables["params"]
    stats = variables["batch_stats"]
    opt_state = tx.init(params)
    jw = jnp.asarray(w)

    @jax.jit
    def step(params, stats, opt_state, x, t):
        def loss_fn(p):
            logp, aux, new_stats = mine.apply(
                {"params": p, "batch_stats": stats}, x, training=True,
                bn_momentum=0.1)
            return mine.loss(logp, t, aux, jw), new_stats

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(
            params, jax.tree_util.tree_map(lambda u: u * lr, updates))
        return params, new_stats, opt_state, loss

    my_losses = []
    for x, t in batches:
        params, stats, opt_state, loss = step(
            params, stats, opt_state, jnp.asarray(x), jnp.asarray(t))
        my_losses.append(float(loss))

    # step 1 is pre-compounding and must match tightly; later steps drift at
    # the fp level because Adam's eps-normalized updates amplify tiny grad
    # differences into +-lr param deltas that compound
    np.testing.assert_allclose(my_losses[0], torch_losses[0], rtol=1e-4)
    np.testing.assert_allclose(my_losses, torch_losses, rtol=2e-2)


def test_loss_parity():
    """Weighted NLL + transform regularizer match torch.nn.functional."""
    r = np.random.default_rng(2)
    logits = r.random((64, 8)).astype(np.float32)
    logp = logits - np.log(np.exp(logits).sum(1, keepdims=True))
    tgt = r.integers(0, 8, 64)
    w = (r.random(8) + 0.5).astype(np.float32)
    import torch.nn.functional as F

    want = F.nll_loss(torch.from_numpy(logp), torch.from_numpy(tgt),
                      weight=torch.from_numpy(w)).item()
    mine = models.get_module("pointnet2_sem_seg")
    got = float(mine.loss(jnp.asarray(logp)[None], jnp.asarray(tgt)[None],
                          None, jnp.asarray(w)))
    np.testing.assert_allclose(got, want, rtol=1e-5)

    # pointnet loss with regularizer
    trans = r.random((4, 64, 64)).astype(np.float32)
    tI = torch.eye(64)[None]
    tt = torch.from_numpy(trans)
    reg = torch.mean(torch.norm(torch.bmm(tt, tt.transpose(2, 1)) - tI,
                                dim=(1, 2))).item()
    want2 = want + 0.001 * reg
    pn = models.get_module("pointnet_sem_seg")
    got2 = float(pn.loss(jnp.asarray(logp)[None], jnp.asarray(tgt)[None],
                         jnp.asarray(trans), jnp.asarray(w)))
    np.testing.assert_allclose(got2, want2, rtol=1e-4)
