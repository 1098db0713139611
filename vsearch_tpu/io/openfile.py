"""Output-file opening with reference-exact failure text.

reference: utils/open_file.cpp open_output_file + fatal_output_open_failed
(open_file.cpp:127-133) — "unable to open output file for writing (<name>)";
"-" maps to standard output (open_file.cpp:99-121 stream duplication).
"""

from __future__ import annotations

import sys
from contextlib import ExitStack
from typing import IO, Optional


def open_output(path: str, name: str = "writing") -> IO[bytes]:
    """``name`` is the CLI option ("--output") baked into the fatal text,
    exactly as the reference's OutputOption does."""
    if path == "-":
        return sys.stdout.buffer
    # multi-host: replicated non-primary drivers stream to the null device
    from ..parallel.distributed import output_path
    path = output_path(path)
    try:
        return open(path, "wb")
    except OSError:
        raise ValueError("unable to open output file for %s (%s)"
                         % (name, path))


def open_output_ctx(path: str, name: str = "writing"):
    """Context manager: closes the handle on exit unless it is stdout."""
    import contextlib
    handle = open_output(path, name)
    if handle is sys.stdout.buffer:
        return contextlib.nullcontext(handle)
    return contextlib.closing(handle)


def open_output_opt(stack: ExitStack, path: Optional[str],
                    name: str = "writing") -> Optional[IO[bytes]]:
    """None passthrough + ExitStack-managed close (stdout is not closed)."""
    if path is None:
        return None
    handle = open_output(path, name)
    if handle is sys.stdout.buffer:
        return handle
    return stack.enter_context(handle)
