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


def test_corpus_pipeline_runs(spark, capsys):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    import corpus_pipeline

    corpus_pipeline.main()
    out = capsys.readouterr().out
    assert "corpus funnel: 500 raw" in out
    assert "corpus pipeline done" in out
    # the funnel only ever shrinks
    import re
    n0, n1, n2, n3 = map(int, re.search(
        r"(\d+) raw -> (\d+) gated -> (\d+) clean -> (\d+) deduped", out).groups())
    assert n0 >= n1 >= n2 >= n3 > 0


def test_audit_timeline_runs(spark, capsys):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    import audit_timeline

    audit_timeline.main()
    out = capsys.readouterr().out
    assert "SCD2 timeline" in out
    assert "time travel matches the actual batch-2 state: True" in out


def test_semantic_curation_runs(spark, capsys):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    import semantic_curation

    semantic_curation.main()
    out = capsys.readouterr().out
    assert "minhash audit" in out and "ANN recall@5" in out
    assert "classifier AUC" in out


def test_econ_analysis_tour_runs(spark, capsys):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    import econ_analysis_tour

    econ_analysis_tour.main()
    out = capsys.readouterr().out
    assert "Granger" in out and "Newey-West" in out
    assert "90th-percentile revenue trend" in out
    assert "ARCH LM" in out and "AR(2) fit" in out
    assert "dominant cycle" in out and "level shifts found" in out
    assert "median days to repeat purchase" in out
    assert "hazard ratio" in out
    assert "econ analysis tour done" in out
