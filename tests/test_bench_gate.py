"""The bench contention gate is record-keeping policy enforced in code:
a run whose calibration brackets are inflated vs the committed quiesced
reference must stamp itself contended=true so its total never supersedes
a quiesced record (rounds 10 and 11 both needed after-the-fact forensics
for exactly this). Pure-function tests — no Spark session."""

from __future__ import annotations

import bench


REF = bench.QUIESCED_CALIBRATION_REF_SEC
TOL = bench.CONTENTION_TOLERANCE


def test_quiesced_run_is_not_contended():
    assert not bench._contended(REF, REF)
    assert not bench._contended(0.073, 0.086)  # the committed band


def test_either_inflated_bracket_flags_the_run():
    hot = REF * TOL * 1.5
    assert bench._contended(hot, REF)      # contended start (r11's case)
    assert bench._contended(REF, hot)      # contention arriving mid-run
    assert bench._contended(hot, hot)


def test_threshold_is_strict():
    edge = REF * TOL
    assert not bench._contended(edge, edge)
    assert bench._contended(edge * 1.01, REF)
