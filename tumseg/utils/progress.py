"""Dependency-free tqdm-equivalent progress meter.

The reference wraps its hot loops in tqdm (``localfunctions.py:202`` train
batches, ``:256`` eval batches, ``:375`` votes; ``from tqdm import tqdm`` at
``:14``). tqdm is not installed in this image, and a progress meter must
never force device readbacks (a ``float(loss)`` per step costs ~26 ms
through the TPU tunnel — more than the step itself), so this meter reports
*iteration* rate only and stays entirely on the host.

``progress(iterable, total=..., desc=...)`` mirrors the tqdm calling
convention used by the reference: an in-place ``\\r``-refreshed stderr line
with count/total, percent, EMA rate, elapsed and ETA, redrawn at most every
``min_interval`` seconds.

Display policy: ON when stderr is a TTY (interactive runs see a live bar,
matching the reference CLIs), OFF otherwise (batch logs stay clean — the
reference's tqdm litters redirected logs with carriage returns).
``TUMSEG_PROGRESS=1`` / ``0`` overrides either way.
"""

from __future__ import annotations

import os
import sys
import time
from typing import Iterable, Iterator, Optional


def _fmt_interval(seconds: float) -> str:
    seconds = int(seconds)
    h, rem = divmod(seconds, 3600)
    m, s = divmod(rem, 60)
    return ("%d:%02d:%02d" % (h, m, s)) if h else ("%02d:%02d" % (m, s))


class progress:
    """tqdm-style iterable wrapper / manual counter.

    Usage::

        for batch in progress(loader, total=len(loader), desc="train"):
            ...

    or manually::

        with progress(total=n, desc="votes") as bar:
            ...
            bar.update()
    """

    def __init__(self, iterable: Optional[Iterable] = None, *,
                 total: Optional[int] = None, desc: str = "",
                 smoothing: float = 0.9, min_interval: float = 0.25,
                 file=None, disable: Optional[bool] = None):
        self.iterable = iterable
        if total is None and iterable is not None:
            try:
                total = len(iterable)  # type: ignore[arg-type]
            except TypeError:
                total = None
        self.total = total
        self.desc = desc
        self.smoothing = smoothing
        self.min_interval = min_interval
        self.file = file if file is not None else sys.stderr
        if disable is None:
            env = os.environ.get("TUMSEG_PROGRESS")
            if env is not None:
                disable = env.strip() in ("0", "false", "off", "")
            else:
                disable = not _isatty(self.file)
        self.disable = disable
        self.n = 0
        self._start = time.monotonic()
        self._last_draw = 0.0
        self._last_t = self._start
        self._ema_rate = 0.0  # iterations/sec, EMA like tqdm's smoothing
        self._drew = False
        self._closed = False

    # ---- iteration -------------------------------------------------------
    def __iter__(self) -> Iterator:
        if self.iterable is None:
            raise TypeError("progress(...) used as iterator without an "
                            "iterable; pass one or use update()")
        try:
            for item in self.iterable:
                yield item
                self.update()
        finally:
            self.close()

    def update(self, n: int = 1) -> None:
        if self._closed:
            return
        now = time.monotonic()
        dt = now - self._last_t
        self._last_t = now
        if dt > 0:
            inst = n / dt
            a = self.smoothing if self._ema_rate else 0.0
            self._ema_rate = a * self._ema_rate + (1.0 - a) * inst
        self.n += n
        if not self.disable and (now - self._last_draw >= self.min_interval
                                 or self.n == self.total):
            self._draw(now)

    # ---- rendering -------------------------------------------------------
    def _line(self, now: float) -> str:
        elapsed = now - self._start
        rate = self._ema_rate or (self.n / elapsed if elapsed > 0 else 0.0)
        bits = []
        if self.desc:
            bits.append(self.desc + ":")
        if self.total:
            pct = 100.0 * self.n / self.total
            bits.append("%3.0f%% %d/%d" % (pct, self.n, self.total))
        else:
            bits.append("%d" % self.n)
        bits.append("[%s" % _fmt_interval(elapsed))
        if self.total and rate > 0 and self.n < self.total:
            bits.append("< %s" % _fmt_interval((self.total - self.n) / rate))
        bits.append("| %.2f it/s]" % rate)
        return " ".join(bits)

    def _draw(self, now: float) -> None:
        try:
            self.file.write("\r" + self._line(now).ljust(60))
            self.file.flush()
        except (ValueError, OSError):  # closed/broken stream: go quiet
            self.disable = True
            return
        self._last_draw = now
        self._drew = True

    def close(self) -> None:
        if self._closed:
            return
        self._closed = True
        if self._drew:
            try:
                self.file.write("\r" + self._line(time.monotonic()).ljust(60)
                                + "\n")
                self.file.flush()
            except (ValueError, OSError):
                pass

    # ---- context manager -------------------------------------------------
    def __enter__(self) -> "progress":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def _isatty(f) -> bool:
    try:
        return bool(f.isatty())
    except Exception:
        return False
