"""Progress meter (tumseg/utils/progress.py) — the tqdm stand-in for the
reference's wrapped loops (localfunctions.py:202,256,375)."""

import io

from tumseg.utils.progress import progress


class _Tty(io.StringIO):
    def isatty(self):
        return True


def test_iterates_transparently_and_counts():
    out = _Tty()
    seen = list(progress(range(5), desc="x", file=out, min_interval=0.0))
    assert seen == [0, 1, 2, 3, 4]
    text = out.getvalue()
    assert "5/5" in text and "x:" in text and text.endswith("\n")
    assert "100%" in text


def test_infers_total_from_len():
    out = _Tty()
    p = progress([10, 20, 30], file=out, min_interval=0.0)
    assert p.total == 3
    assert list(p) == [10, 20, 30]


def test_disabled_on_non_tty_writes_nothing():
    out = io.StringIO()  # isatty() False
    assert list(progress(range(3), file=out)) == [0, 1, 2]
    assert out.getvalue() == ""


def test_env_override_forces_on(monkeypatch):
    monkeypatch.setenv("TUMSEG_PROGRESS", "1")
    out = io.StringIO()
    list(progress(range(2), file=out, min_interval=0.0))
    assert "2/2" in out.getvalue()


def test_env_override_forces_off(monkeypatch):
    monkeypatch.setenv("TUMSEG_PROGRESS", "0")
    out = _Tty()
    list(progress(range(2), file=out, min_interval=0.0))
    assert out.getvalue() == ""


def test_manual_update_context_manager():
    out = _Tty()
    with progress(total=4, desc="votes", file=out, min_interval=0.0) as bar:
        for _ in range(4):
            bar.update()
    assert "4/4" in out.getvalue()


def test_unknown_total_renders_count_only():
    out = _Tty()

    def gen():
        yield from range(3)

    list(progress(gen(), file=out, min_interval=0.0))
    assert "3" in out.getvalue() and "%" not in out.getvalue()


def test_broken_stream_goes_quiet():
    class Boom(_Tty):
        def write(self, s):
            raise OSError("closed")

    # must not raise from inside the wrapped loop
    assert list(progress(range(3), file=Boom(), min_interval=0.0)) == [0, 1, 2]


def test_exception_in_loop_still_closes():
    out = _Tty()
    p = progress(range(10), file=out, min_interval=0.0)
    try:
        for i in p:
            if i == 2:
                raise RuntimeError("stop")
    except RuntimeError:
        pass
    assert p._closed and out.getvalue().endswith("\n")
