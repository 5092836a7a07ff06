"""The examples/quickstart.py walkthrough must keep running."""

from __future__ import annotations

import os
import sys


def test_quickstart_runs(spark, capsys):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    import quickstart

    quickstart.main()  # reuses the fixture session via getOrCreate
    out = capsys.readouterr().out
    assert "'updated': 3" in out
    assert "revision history" in out
