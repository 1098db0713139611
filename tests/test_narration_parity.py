"""Narration parity: non-quiet stderr and --log bodies must match the
reference byte-for-byte after stripping volatile lines (banner, command
line, timestamps, memory).  Covers the reference's Progress prompts
(progress.hpp), summary statistics, and log duplication idiom for every
command (driver: tools/narration_sweep.py)."""

import sys

import pytest

sys.path.insert(0, "/root/repo/tools")

import narration_sweep  # noqa: E402

from .conftest import REF_BINARY, REF_DATA  # noqa: E402


@pytest.mark.parametrize("name", list(narration_sweep.CASES)
                         + list(narration_sweep.ERROR_CASES))
def test_narration(name):
    if not REF_BINARY.exists() or not REF_DATA.exists():
        pytest.skip("reference binary/fixtures unavailable")
    assert narration_sweep.run_named(name), \
        "narration differs for %s (see stdout diff)" % name
