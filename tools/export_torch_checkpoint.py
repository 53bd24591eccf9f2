"""Export a tumseg checkpoint back to a PyTorch reference state_dict, the
inverse of port_torch_checkpoint.py — so models trained on TPU can be
loaded by the reference pipeline (sem_seg_testing.py) or any torch tooling
for cross-validation.

Usage:
    python tools/export_torch_checkpoint.py best_model.pth out.pth \
        --model pointnet2_sem_seg
(the input is a tumseg-ckpt-v2 npz checkpoint from tumseg.train.checkpoint)
"""

from __future__ import annotations

import argparse
from typing import Dict

import numpy as np


def _wT(w: np.ndarray, conv_rank: int) -> np.ndarray:
    """tumseg [in, out] dense kernel -> torch conv/linear weight layout."""
    t = np.asarray(w).T  # [out, in]
    for _ in range(conv_rank):
        t = t[..., None]
    return np.ascontiguousarray(t)


def _emit_bn(state: Dict, prefix: str, params, stats) -> None:
    state[f"{prefix}.weight"] = np.asarray(params["scale"])
    state[f"{prefix}.bias"] = np.asarray(params["bias"])
    state[f"{prefix}.running_mean"] = np.asarray(stats["mean"])
    state[f"{prefix}.running_var"] = np.asarray(stats["var"])
    state[f"{prefix}.num_batches_tracked"] = np.asarray(0, dtype=np.int64)


def _emit_mlp(state, conv_prefix, bn_prefix, params, stats, conv_rank):
    for j, (layer_p, layer_s) in enumerate(zip(params, stats)):
        state[f"{conv_prefix}.{j}.weight"] = _wT(layer_p["conv"]["w"], conv_rank)
        state[f"{conv_prefix}.{j}.bias"] = np.asarray(layer_p["conv"]["b"])
        _emit_bn(state, f"{bn_prefix}.{j}", layer_p["bn"], layer_s)


def export_state_dict(variables: Dict, model_name: str) -> Dict[str, np.ndarray]:
    params, stats = variables["params"], variables["batch_stats"]
    state: Dict[str, np.ndarray] = {}
    if model_name.startswith("pointnet2"):
        for name in ["sa1", "sa2", "sa3", "sa4"]:
            _emit_mlp(state, f"{name}.mlp_convs", f"{name}.mlp_bns",
                      params[name], stats[name], conv_rank=2)
        for name in ["fp4", "fp3", "fp2", "fp1"]:
            _emit_mlp(state, f"{name}.mlp_convs", f"{name}.mlp_bns",
                      params[name], stats[name], conv_rank=1)
        state["conv1.weight"] = _wT(params["conv1"]["w"], 1)
        state["conv1.bias"] = np.asarray(params["conv1"]["b"])
        _emit_bn(state, "bn1", params["bn1"], stats["bn1"])
        state["conv2.weight"] = _wT(params["conv2"]["w"], 1)
        state["conv2.bias"] = np.asarray(params["conv2"]["b"])
        return state
    if model_name.startswith("pointnet"):
        def emit_stn(prefix, p, s):
            for name, rank in [("conv1", 1), ("conv2", 1), ("conv3", 1),
                               ("fc1", 0), ("fc2", 0), ("fc3", 0)]:
                state[f"{prefix}.{name}.weight"] = _wT(p[name]["w"], rank)
                state[f"{prefix}.{name}.bias"] = np.asarray(p[name]["b"])
            for i in range(1, 6):
                _emit_bn(state, f"{prefix}.bn{i}", p[f"bn{i}"], s[f"bn{i}"])

        emit_stn("feat.stn", params["feat"]["stn"], stats["feat"]["stn"])
        emit_stn("feat.fstn", params["feat"]["fstn"], stats["feat"]["fstn"])
        for i in range(1, 4):
            state[f"feat.conv{i}.weight"] = _wT(params["feat"][f"conv{i}"]["w"], 1)
            state[f"feat.conv{i}.bias"] = np.asarray(params["feat"][f"conv{i}"]["b"])
            _emit_bn(state, f"feat.bn{i}", params["feat"][f"bn{i}"],
                     stats["feat"][f"bn{i}"])
        for i in range(1, 5):
            state[f"conv{i}.weight"] = _wT(params[f"conv{i}"]["w"], 1)
            state[f"conv{i}.bias"] = np.asarray(params[f"conv{i}"]["b"])
            if i < 4:
                _emit_bn(state, f"bn{i}", params[f"bn{i}"], stats[f"bn{i}"])
        return state
    raise ValueError(f"unknown model {model_name!r}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint", help="tumseg checkpoint (tumseg-ckpt-v2)")
    ap.add_argument("out", help="output .pth")
    ap.add_argument("--model", default="pointnet2_sem_seg")
    args = ap.parse_args()

    import torch

    from tumseg.train.checkpoint import load_checkpoint

    state = load_checkpoint(args.checkpoint)
    variables = state["model_state_dict"]
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_state_dict(variables, args.model).items()}
    torch.save({"epoch": state.get("epoch", 0),
                "class_avg_iou": state.get("class_avg_iou"),
                "model_state_dict": sd}, args.out)
    print(f"wrote {len(sd)} tensors to {args.out}")


if __name__ == "__main__":
    main()
