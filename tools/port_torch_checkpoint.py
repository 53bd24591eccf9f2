"""Port a PyTorch reference checkpoint (.pth state_dict) into tumseg's
parameter pytrees, so "same weights -> matching mIoU" parity can be verified
against the reference pipeline.

Usage:
    python tools/port_torch_checkpoint.py best_model.pth out.npz \
        --model pointnet2_sem_seg --num_classes 8 --num_extra_features 0

Name mapping (torch -> tumseg):
    sa1.mlp_convs.0.weight [out,in,1,1] -> params.sa1[0].conv.w (transposed)
    sa1.mlp_bns.0.{weight,bias}         -> params.sa1[0].bn.{scale,bias}
    sa1.mlp_bns.0.running_{mean,var}    -> batch_stats.sa1[0].{mean,var}
    fp4.mlp_convs.0.weight [out,in,1]   -> params.fp4[0].conv.w
    conv1.weight / bn1.*                -> head
    feat.stn.*, feat.fstn.*, feat.conv* -> pointnet encoder blocks
"""

from __future__ import annotations

import argparse
from typing import Dict

import numpy as np


def _w(t) -> np.ndarray:
    """torch conv/linear weight -> [in, out] dense kernel."""
    a = np.asarray(t, dtype=np.float32)
    while a.ndim > 2:  # squeeze trailing 1x1 conv dims
        assert a.shape[-1] == 1, a.shape
        a = a[..., 0]
    return a.T.copy()  # torch is [out, in]


def _vec(t) -> np.ndarray:
    return np.asarray(t, dtype=np.float32).copy()


def port_state_dict(state: Dict[str, "np.ndarray"], model_name: str) -> Dict:
    """Convert a torch state_dict (tensors or arrays) into
    {'params': ..., 'batch_stats': ...} for the named tumseg model."""
    state = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
             for k, v in state.items()}
    if model_name.startswith("pointnet2"):
        return _port_pointnet2(state)
    if model_name.startswith("pointnet"):
        return _port_pointnet(state)
    raise ValueError(f"unknown model {model_name!r}")


def _bn(state, prefix):
    params = {"scale": _vec(state[f"{prefix}.weight"]),
              "bias": _vec(state[f"{prefix}.bias"])}
    stats = {"mean": _vec(state[f"{prefix}.running_mean"]),
             "var": _vec(state[f"{prefix}.running_var"])}
    return params, stats


def _mlp_stack(state, conv_prefix, bn_prefix):
    params, stats = [], []
    j = 0
    while f"{conv_prefix}.{j}.weight" in state:
        bn_p, bn_s = _bn(state, f"{bn_prefix}.{j}")
        params.append({"conv": {"w": _w(state[f"{conv_prefix}.{j}.weight"]),
                                "b": _vec(state[f"{conv_prefix}.{j}.bias"])},
                       "bn": bn_p})
        stats.append(bn_s)
        j += 1
    assert params, f"no layers found under {conv_prefix}"
    return params, stats


def _port_pointnet2(state) -> Dict:
    params: Dict = {}
    stats: Dict = {}
    for name in ["sa1", "sa2", "sa3", "sa4", "fp4", "fp3", "fp2", "fp1"]:
        params[name], stats[name] = _mlp_stack(
            state, f"{name}.mlp_convs", f"{name}.mlp_bns")
    params["conv1"] = {"w": _w(state["conv1.weight"]),
                       "b": _vec(state["conv1.bias"])}
    params["bn1"], stats["bn1"] = _bn(state, "bn1")
    params["conv2"] = {"w": _w(state["conv2.weight"]),
                       "b": _vec(state["conv2.bias"])}
    return {"params": params, "batch_stats": stats}


def _port_stn(state, prefix) -> tuple:
    params: Dict = {}
    stats: Dict = {}
    for name in ["conv1", "conv2", "conv3", "fc1", "fc2", "fc3"]:
        params[name] = {"w": _w(state[f"{prefix}.{name}.weight"]),
                        "b": _vec(state[f"{prefix}.{name}.bias"])}
    for i in range(1, 6):
        params[f"bn{i}"], stats[f"bn{i}"] = _bn(state, f"{prefix}.bn{i}")
    return params, stats


def _port_pointnet(state) -> Dict:
    params: Dict = {}
    stats: Dict = {}
    feat_p: Dict = {}
    feat_s: Dict = {}
    feat_p["stn"], feat_s["stn"] = _port_stn(state, "feat.stn")
    feat_p["fstn"], feat_s["fstn"] = _port_stn(state, "feat.fstn")
    for i in range(1, 4):
        feat_p[f"conv{i}"] = {"w": _w(state[f"feat.conv{i}.weight"]),
                              "b": _vec(state[f"feat.conv{i}.bias"])}
        feat_p[f"bn{i}"], feat_s[f"bn{i}"] = _bn(state, f"feat.bn{i}")
    params["feat"] = feat_p
    stats["feat"] = feat_s
    for i in range(1, 5):
        params[f"conv{i}"] = {"w": _w(state[f"conv{i}.weight"]),
                              "b": _vec(state[f"conv{i}.bias"])}
        if i < 4:
            params[f"bn{i}"], stats[f"bn{i}"] = _bn(state, f"bn{i}")
    return {"params": params, "batch_stats": stats}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint")
    ap.add_argument("out", help="output .npz (flat tree) path")
    ap.add_argument("--model", default="pointnet2_sem_seg")
    args = ap.parse_args()

    import torch

    ckpt = torch.load(args.checkpoint, map_location="cpu", weights_only=False)
    state = ckpt.get("model_state_dict", ckpt)
    variables = port_state_dict(state, args.model)

    import jax

    flat = {"/".join(map(str, path)): np.asarray(leaf)
            for path, leaf in jax.tree_util.tree_flatten_with_path(
                variables, is_leaf=lambda x: isinstance(x, np.ndarray))[0]}
    # jax key paths print like ['params']['sa1'][0]['conv']['w']; normalize
    flat = {k.replace("['", "").replace("']", "/").replace("[", "").replace("]", "/").rstrip("/"): v
            for k, v in flat.items()}
    np.savez(args.out, **flat)
    print(f"wrote {len(flat)} arrays to {args.out}")


if __name__ == "__main__":
    main()
