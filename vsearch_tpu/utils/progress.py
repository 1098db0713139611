"""Progress meter and dual stderr/log messaging.

reference: src/utils/progress.hpp (RAII percent meter: prompt printed at
construction when not quiet, percent updates only when stderr is a tty and
--no_progress is unset, and a final " 100%" on completion) and the
stderr+fp_log dual-emit idiom used throughout the reference commands
(e.g. src/core/db.cpp:300-345 — stderr gets "...\n", the log gets "...\n\n").
"""

from __future__ import annotations

import sys
from typing import Optional


class Progress:
    """Context-manager percent meter on stderr.

    reference: utils/progress.hpp:68-158.  When stderr is not a tty (or
    --no_progress / --quiet), output degrades to "<prompt> 100%\\n" emitted
    at completion — matching the reference byte-for-byte in piped runs.
    """

    def __init__(self, prompt: str, max_size: int, params) -> None:
        self._prompt = prompt
        self._max = max_size
        self._quiet = bool(params.opt_quiet)
        self._visible = (sys.stderr.isatty() and not self._quiet
                         and not params.opt_no_progress)
        self._counter = 0
        self._pct = 0
        self._next = 0
        if self._quiet:
            return
        sys.stderr.write(prompt)
        sys.stderr.flush()
        if not self._visible:
            return
        sys.stderr.write(" 0%")
        if max_size == 0:
            sys.stderr.write("  \r%s 0%%" % prompt)
            return
        self._pct = self._calc_pct()
        self._next = self._calc_next()

    def _calc_pct(self) -> int:
        if self._max == 0:
            return 0
        return self._counter * 100 // self._max

    def _calc_next(self) -> int:
        return ((self._pct + 1) * self._max + 99) // 100

    def update(self, counter: Optional[int] = None) -> None:
        if counter is None:
            self._counter += 1
        else:
            self._counter = counter
        if not self._visible or self._counter < self._next:
            return
        self._pct = self._calc_pct()
        sys.stderr.write("  \r%s %d%%" % (self._prompt, self._pct))
        sys.stderr.flush()
        self._next = self._calc_next()

    def done(self) -> None:
        if self._quiet:
            return
        if self._visible:
            sys.stderr.write("  \r%s" % self._prompt)
        sys.stderr.write(" 100%\n")
        sys.stderr.flush()

    def __enter__(self) -> "Progress":
        return self

    def __exit__(self, *exc) -> None:
        self.done()


def phase(params, prompt: str) -> None:
    """One-shot phase marker: "<prompt> 100%\\n" on stderr (non-tty shape of
    a full Progress run).  For phases whose inner loop isn't worth
    instrumenting with per-item updates."""
    Progress(prompt, 1, params).done()


def message(params, text: str) -> None:
    """Emit a summary line to stderr (unless --quiet) and to --log.

    Mirrors the reference per-command idiom: the log copy gets an extra
    trailing blank line (e.g. db.cpp:322-341).
    """
    if not params.opt_quiet:
        sys.stderr.write(text + "\n")
    log = getattr(params, "fp_log", None)
    if log is not None:
        log.write((text + "\n\n").encode())


def message_both(params, text: str) -> None:
    """Emit identically to stderr (unless --quiet) and to --log (no extra
    blank line) — for multi-line report blocks."""
    if not params.opt_quiet:
        sys.stderr.write(text)
    log = getattr(params, "fp_log", None)
    if log is not None:
        log.write(text.encode())
