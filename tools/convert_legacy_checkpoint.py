"""Convert a round-1 pickle checkpoint to the safe tumseg-ckpt-v2 format.

The v2 loader (tumseg/train/checkpoint.py) refuses to unpickle; this is the
explicit, opt-in escape hatch for trusted legacy files:

    python tools/convert_legacy_checkpoint.py old_best_model.pth new_best_model.pth

Only run it on checkpoints you produced yourself — pickle.load executes
arbitrary code from the file.
"""

import argparse
import pickle
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from tumseg.train import checkpoint as ckpt  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("legacy", help="round-1 pickle checkpoint (TRUSTED only)")
    ap.add_argument("out", help="output v2 checkpoint path")
    args = ap.parse_args()

    with open(args.legacy, "rb") as f:
        state = pickle.load(f)  # noqa: S301 - explicit trusted-input tool
    ckpt.save_checkpoint(
        args.out, epoch=state.get("epoch", 0),
        variables=state["model_state_dict"],
        opt_state=state.get("optimizer_state_dict"),
        class_avg_iou=state.get("class_avg_iou"))
    print(f"wrote {args.out} ({ckpt.FORMAT})")


if __name__ == "__main__":
    main()
