#!/usr/bin/env python
"""Production-scale CLI soak on the real device: full default config
(4096-pt blocks, B=16 train / B=32 test, bf16), multi-epoch train with
checkpointing + per-epoch eval, then whole-scene voting test with
artifacts — the reference's complete sem_seg_training.py ->
sem_seg_testing.py workflow (localfunctions.py:159-479) at real tile
sizes, exercised end to end on TPU rather than the CPU test suite's toy
shapes.

Usage: python benchmarks/soak.py [--points 600000] [--epochs 3] [--votes 3]
Prints one JSON line per phase and a summary line.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

from tumseg.utils.cache import enable_compile_cache

enable_compile_cache()

import numpy as np


def make_tile(path, n, seed):
    """Facade-shaped tile: 20m x 4m x 12m with crude structure so labels
    are learnable (z-bands + wall/window stripes), RGB correlated."""
    r = np.random.default_rng(seed)
    xyz = np.stack([r.uniform(0, 20, n), r.uniform(0, 4, n),
                    r.uniform(0, 12, n)], 1)
    labels = np.full(n, 1)                    # wall
    labels[xyz[:, 2] < 0.5] = 3               # ground band
    stripe = ((xyz[:, 0] // 2).astype(int) % 2 == 1) & (xyz[:, 2] > 2)
    labels[stripe] = 2                        # window stripes
    labels[xyz[:, 2] > 11.0] = 7              # roof band
    rgb = np.zeros((n, 3), np.uint16)
    for lab, col in [(1, (200, 60, 60)), (2, (60, 60, 200)),
                     (3, (60, 200, 60)), (7, (200, 200, 60))]:
        m = labels == lab
        rgb[m] = np.asarray(col) + r.integers(-30, 30, (int(m.sum()), 3))
    from tumseg.data.las import write_las

    write_las(path, xyz, labels, rgb=rgb.astype(np.uint16))
    return n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=600_000)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--votes", type=int, default=3)
    ap.add_argument("--workdir", default="/tmp/tumseg_soak")
    args = ap.parse_args()

    from pathlib import Path

    work = Path(args.workdir)
    shutil.rmtree(work, ignore_errors=True)
    (work / "data").mkdir(parents=True)

    t0 = time.perf_counter()
    for name, seed in [("facadeA.las", 0), ("facadeB.las", 1),
                       ("test_tile.las", 2)]:
        make_tile(str(work / "data" / name), args.points, seed)
    print(json.dumps({"phase": "synth", "tiles": 3, "points": args.points,
                      "s": round(time.perf_counter() - t0, 1)}), flush=True)

    from tumseg.cli import test as test_cli
    from tumseg.cli import train as train_cli

    common = [
        "--rootdir", str(work / "data"),
        "--test_area", "test_tile.las",
        "--model", "pointnet2_sem_seg",
        "--class8", "--bf16",
        "--exp_dir", str(work / "log"),
        "--log_dir", "soak",
        "--seed", "0",
    ]
    t0 = time.perf_counter()
    targs = train_cli.parse_args(common + [
        "--epoch", str(args.epochs), "--batch_size", "16",
        "--npoint", "4096"])
    acc, ml, iou = train_cli.main(targs)
    train_s = time.perf_counter() - t0
    print(json.dumps({"phase": "train", "epochs": args.epochs,
                      "s": round(train_s, 1),
                      "final_loss": round(float(ml[-1]), 4),
                      "final_acc": round(float(acc[-1]), 4),
                      "final_eval_miou": round(float(iou[-1]), 4)}),
          flush=True)

    t0 = time.perf_counter()
    eargs = test_cli.parse_args(common + [
        "--exp_dir", str(work / "log") + "/sem_seg/",
        "--batch_size", "32", "--num_point", "4096",
        "--num_votes", str(args.votes), "--visual"])
    out = test_cli.main(eargs)
    test_s = time.perf_counter() - t0
    print(json.dumps({"phase": "test", "votes": args.votes,
                      "s": round(test_s, 1),
                      "miou": round(float(out["miou"]), 4),
                      "scene_pts_per_s": round(
                          args.points * args.votes / test_s, 1)}), flush=True)

    ok = (np.isfinite(ml).all() and out["miou"] > 0.3
          and (work / "log" / "sem_seg" / "soak" / "checkpoints"
               / "best_model.pth").exists()
          and (work / "log" / "sem_seg" / "soak" / "visual"
               / "test_tile.txt").exists())
    print(json.dumps({"phase": "summary", "ok": bool(ok),
                      "train_s": round(train_s, 1),
                      "test_s": round(test_s, 1)}), flush=True)


if __name__ == "__main__":
    main()
