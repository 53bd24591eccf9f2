"""Repo-level entry points: drop-in scripts and the driver graft contract."""

import importlib.util
import sys


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_drop_in_scripts_importable():
    t = _load("/root/repo/sem_seg_training.py", "sst")
    assert callable(t.main) and callable(t.parse_args)
    e = _load("/root/repo/sem_seg_testing.py", "sse")
    assert callable(e.main) and callable(e.parse_args)


def test_cli_help_smoke(capsys):
    import pytest

    from tumseg.cli import test as test_cli
    from tumseg.cli import train as train_cli

    for parse in (train_cli.parse_args, test_cli.parse_args):
        with pytest.raises(SystemExit):
            parse(["--help"])
        out = capsys.readouterr().out
        assert "--test_area" in out and "--RGB_OFF" in out


def test_graft_entry_contract():
    g = _load("/root/repo/__graft_entry__.py", "graft")
    fn, args = g.entry()
    assert callable(fn) and len(args) == 2
    import jax

    out = jax.eval_shape(fn, *args)  # traceable without executing
    assert out.shape == (2, 4096, 8)


def test_bench_script_shape():
    src = open("/root/repo/bench.py").read()
    assert "vs_baseline" in src and "json.dumps" in src
