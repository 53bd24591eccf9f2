"""End-to-end CLI smoke: 1-epoch train + voting test on synthetic LAS tiles,
exercising the full reference workflow surface (train -> checkpoint -> test
-> IoU report + artifacts)."""

import glob
import os

import numpy as np
import pytest

from tumseg.data.las import write_las


@pytest.fixture
def workspace(tmp_path):
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    r = np.random.default_rng(0)
    for name in ["buildingA.las", "buildingB.las", "test_tile.las"]:
        n = 12000
        xyz = np.stack([r.uniform(0, 4, n), r.uniform(0, 2, n),
                        r.uniform(0, 5, n)], 1)
        labels = r.choice([1, 2, 3, 7], n)
        rgb = r.integers(0, 256, (n, 3)).astype(np.uint16)
        write_las(str(data_dir / name), xyz, labels, rgb=rgb)
    return tmp_path


def test_train_then_test_cli(workspace, monkeypatch):
    from tumseg.cli import test as test_cli
    from tumseg.cli import train as train_cli

    monkeypatch.chdir(workspace)
    common = [
        "--rootdir", str(workspace / "data"),
        "--test_area", "test_tile.las",
        "--model", "pointnet_sem_seg",
        "--class8",
        "--exp_dir", str(workspace / "log"),
        "--log_dir", "run1",
        "--seed", "0",
    ]
    targs = train_cli.parse_args(common + [
        "--epoch", "1", "--batch_size", "4", "--npoint", "128"])
    acc, ml, iou = train_cli.main(targs)
    assert len(acc) == 1 and np.isfinite(ml[0])

    ckpt_path = workspace / "log" / "sem_seg" / "run1" / "checkpoints" / "best_model.pth"
    assert ckpt_path.exists()

    eargs = test_cli.parse_args(common + [
        "--exp_dir", str(workspace / "log") + "/sem_seg/",
        "--batch_size", "4", "--num_point", "128", "--num_votes", "2",
        "--visual"])
    out = test_cli.main(eargs)
    assert 0.0 <= out["miou"] <= 1.0

    visual = workspace / "log" / "sem_seg" / "run1" / "visual"
    assert (visual / "test_tile.txt").exists()
    assert (visual / "test_tile_pred.obj").exists()
    # eval log written
    assert (workspace / "log" / "sem_seg" / "run1" / "eval.txt").exists()


def test_train_with_las_extra_features(tmp_path, monkeypatch):
    """--extra_features resolves named CloudCompare-style scalar fields from
    the LAS Extra Bytes VLR (reference sem_seg_training.py:150-153)."""
    from tumseg.cli import train as train_cli

    data_dir = tmp_path / "data"
    data_dir.mkdir()
    r = np.random.default_rng(1)
    for name in ["a.las", "b.las", "t.las"]:
        n = 9000
        xyz = np.stack([r.uniform(0, 3, n), r.uniform(0, 2, n),
                        r.uniform(0, 4, n)], 1)
        labels = r.choice([1, 2, 3, 7], n)
        write_las(str(data_dir / name), xyz, labels,
                  extra={"Planarity": r.random(n).astype(np.float32)})
    monkeypatch.chdir(tmp_path)
    args = train_cli.parse_args([
        "--rootdir", str(data_dir), "--test_area", "t.las",
        "--model", "pointnet_sem_seg", "--class8", "--RGB_OFF",
        "--extra_features", "Planarity",
        "--exp_dir", str(tmp_path / "log"), "--log_dir", "ef",
        "--seed", "0", "--epoch", "1", "--batch_size", "4",
        "--npoint", "128"])
    acc, _, _ = train_cli.main(args)
    assert len(acc) == 1


def test_train_with_computed_geometry(tmp_path, monkeypatch):
    """--calculate_geometry computes scipy PCA features per room (the
    reference's broken geofunction path, fixed)."""
    from tumseg.cli import train as train_cli

    data_dir = tmp_path / "data"
    data_dir.mkdir()
    r = np.random.default_rng(2)
    for name in ["a.las", "b.las", "t.las"]:
        n = 6000
        xyz = np.stack([r.uniform(0, 2, n), r.uniform(0, 1.5, n),
                        r.uniform(0, 2, n)], 1)
        labels = r.choice([1, 2, 3, 7], n)
        write_las(str(data_dir / name), xyz, labels)
    monkeypatch.chdir(tmp_path)
    args = train_cli.parse_args([
        "--rootdir", str(data_dir), "--test_area", "t.las",
        "--model", "pointnet_sem_seg", "--class8", "--RGB_OFF",
        "--extra_features", "Planarity", "Omnivariance",
        "--calculate_geometry", "1",
        "--exp_dir", str(tmp_path / "log"), "--log_dir", "geo",
        "--seed", "0", "--epoch", "1", "--batch_size", "4",
        "--npoint", "128"])
    acc, _, _ = train_cli.main(args)
    assert len(acc) == 1


def test_train_then_test_cli_multidevice(workspace, monkeypatch):
    """--num_devices 8 exercises the shard_map training path and the
    mesh-sharded voting forward end-to-end on the virtual CPU mesh."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from tumseg.cli import test as test_cli
    from tumseg.cli import train as train_cli

    monkeypatch.chdir(workspace)
    common = [
        "--rootdir", str(workspace / "data"),
        "--test_area", "test_tile.las",
        "--model", "pointnet_sem_seg",
        "--class8",
        "--exp_dir", str(workspace / "log"),
        "--log_dir", "mesh_run",
        "--seed", "0",
        "--num_devices", "8",
    ]
    targs = train_cli.parse_args(common + [
        "--epoch", "1", "--batch_size", "8", "--npoint", "128"])
    acc, ml, iou = train_cli.main(targs)
    assert len(acc) == 1 and np.isfinite(ml[0])

    eargs = test_cli.parse_args(common + [
        "--exp_dir", str(workspace / "log") + "/sem_seg/",
        "--batch_size", "8", "--num_point", "128", "--num_votes", "1"])
    out = test_cli.main(eargs)
    assert 0.0 <= out["miou"] <= 1.0


def test_train_then_test_cli_msg_model(workspace, monkeypatch):
    """The MSG model end-to-end through both CLIs (fused-kernel grouping
    path on TPU; XLA path here)."""
    from tumseg.cli import test as test_cli
    from tumseg.cli import train as train_cli

    monkeypatch.chdir(workspace)
    common = [
        "--rootdir", str(workspace / "data"),
        "--test_area", "test_tile.las",
        "--model", "pointnet2_sem_seg_msg",
        "--class8",
        "--exp_dir", str(workspace / "log"),
        "--log_dir", "msg_run",
        "--seed", "0",
    ]
    targs = train_cli.parse_args(common + [
        "--epoch", "1", "--batch_size", "4", "--npoint", "128"])
    acc, ml, iou = train_cli.main(targs)
    assert len(acc) == 1 and np.isfinite(ml[0])
    eargs = test_cli.parse_args(common + [
        "--exp_dir", str(workspace / "log") + "/sem_seg/",
        "--batch_size", "4", "--num_point", "128", "--num_votes", "1"])
    out = test_cli.main(eargs)
    assert 0.0 <= out["miou"] <= 1.0


def test_train_resume_rejects_legacy_pickle(workspace, monkeypatch):
    """A round-1 pickle at the resume path must abort with the conversion
    hint, NOT silently restart and overwrite the old run."""
    import pickle

    from tumseg.cli import train as train_cli

    monkeypatch.chdir(workspace)
    ckpt_dir = workspace / "log" / "sem_seg" / "legacy_run" / "checkpoints"
    ckpt_dir.mkdir(parents=True)
    with open(ckpt_dir / "best_model.pth", "wb") as f:
        pickle.dump({"epoch": 3, "model_state_dict": {}}, f)
    args = train_cli.parse_args([
        "--rootdir", str(workspace / "data"), "--test_area", "test_tile.las",
        "--model", "pointnet_sem_seg", "--class8",
        "--exp_dir", str(workspace / "log"), "--log_dir", "legacy_run",
        "--seed", "0", "--epoch", "1", "--batch_size", "4",
        "--npoint", "128"])
    with pytest.raises(SystemExit, match="convert_legacy_checkpoint"):
        train_cli.main(args)


def test_train_resume(workspace, monkeypatch):
    """Second invocation warm-starts from the saved best checkpoint."""
    from tumseg.cli import train as train_cli

    monkeypatch.chdir(workspace)
    common = [
        "--rootdir", str(workspace / "data"),
        "--test_area", "test_tile.las",
        "--model", "pointnet_sem_seg",
        "--class8",
        "--exp_dir", str(workspace / "log"),
        "--log_dir", "resume_run",
        "--seed", "0",
        "--epoch", "1", "--batch_size", "4", "--npoint", "128",
    ]
    train_cli.main(train_cli.parse_args(common))
    # resume: start_epoch comes from the checkpoint (0 < epoch arg 2)
    args2 = train_cli.parse_args([a if a != "1" else "2" for a in common])
    acc, _, _ = train_cli.main(args2)
    assert len(acc) >= 1


def test_train_then_test_cli_18class(workspace, monkeypatch):
    """The reference DEFAULT taxonomy: no --class8 -> 18 classes with raw
    LAS codes used unmapped (sem_seg_training.py:335-340), color ON
    (no --RGB_OFF, :351-354) — end-to-end through both CLIs."""
    from tumseg.cli import test as test_cli
    from tumseg.cli import train as train_cli

    monkeypatch.chdir(workspace)
    common = [
        "--rootdir", str(workspace / "data"),
        "--test_area", "test_tile.las",
        "--model", "pointnet_sem_seg",
        "--exp_dir", str(workspace / "log"),
        "--log_dir", "raw18",
        "--seed", "0",
    ]
    targs = train_cli.parse_args(common + [
        "--epoch", "1", "--batch_size", "4", "--npoint", "128"])
    acc, ml, iou = train_cli.main(targs)
    assert len(acc) == 1 and np.isfinite(ml[0])
    eargs = test_cli.parse_args(common + [
        "--exp_dir", str(workspace / "log") + "/sem_seg/",
        "--batch_size", "4", "--num_point", "128", "--num_votes", "1"])
    out = test_cli.main(eargs)
    assert 0.0 <= out["miou"] <= 1.0
    assert len(out["iou"]) == 18


def test_train_cli_device_pipeline(workspace, monkeypatch):
    """--data_pipeline device: rooms uploaded once, per-step input is a PRNG
    key + room ids, block sampling/featurize fused into the step jit."""
    from tumseg.cli import train as train_cli

    monkeypatch.chdir(workspace)
    args = train_cli.parse_args([
        "--rootdir", str(workspace / "data"), "--test_area", "test_tile.las",
        "--model", "pointnet_sem_seg", "--class8",
        "--exp_dir", str(workspace / "log"), "--log_dir", "devpipe",
        "--seed", "0", "--epoch", "1", "--batch_size", "4",
        "--npoint", "128", "--data_pipeline", "device", "--superstep", "2"])
    acc, ml, iou = train_cli.main(args)
    assert len(acc) == 1 and np.isfinite(ml[0])
    ckpt = (workspace / "log" / "sem_seg" / "devpipe" / "checkpoints"
            / "best_model.pth")
    assert ckpt.exists()
