"""The bench contention gate is record-keeping policy enforced in code:
a run measured on a contended host must stamp itself contended=true so
its total never supersedes a quiesced record (rounds 10 and 11 both
needed after-the-fact forensics for exactly this). The rule is
calibrated against every adjudicated run on record — these tests pin
those four verdicts. Pure-function tests, no Spark session."""

from __future__ import annotations

import bench


REF = bench.QUIESCED_CALIBRATION_REF_SEC


def test_r11_driver_run_contended_by_loadavg():
    # 452.8 s, calib start 0.163 / end 0.086 (CLEAN), loadavg 6.27 —
    # the historically contended run calibration alone would miss
    assert bench._contended(0.1633, 0.0861, 6.27)


def test_r11_builder_record_quiesced_despite_noisy_start():
    # the ACCEPTED 404.8 s record: start 0.315 (post-warm-up JIT noise),
    # end 0.073, loadavg 0.35 — must NOT be flagged
    assert not bench._contended(0.3152, 0.0734, 0.35)


def test_r12_run1_contended_warm_host():
    # 359.7 s: start 0.155 at loadavg 2.11 — inflated start on a busy
    # host counts
    assert bench._contended(0.1552, 0.0747, 2.11)


def test_r12_run2_quiesced():
    # 337.4 s: start 0.129 (structural noise) at loadavg 0.71, end 0.097
    # under the 1.25x limit — the quiesced record
    assert not bench._contended(0.1285, 0.0968, 0.71)


def test_inflated_end_bracket_always_flags():
    hot = REF * bench.CONTENTION_TOLERANCE * 1.5
    assert bench._contended(REF, hot, 0.1)


def test_no_loadavg_falls_back_to_strict_start():
    lim = REF * bench.CONTENTION_TOLERANCE
    assert bench._contended(lim * 1.1, REF, None)
    assert not bench._contended(lim * 0.9, REF, None)


def test_contended_run_diverts_to_sidecar(tmp_path):
    import json

    base = tmp_path / "bench_details.json"
    # no prior record: even a contended run writes the canonical file
    assert bench._details_path(str(base), True) == str(base)
    # prior QUIESCED record: a contended run must divert to the sidecar
    base.write_text(json.dumps({"machine": {"contended": False}}))
    assert bench._details_path(str(base), True) == str(
        tmp_path / "bench_details_contended.json"
    )
    # a quiesced run always writes the canonical file
    assert bench._details_path(str(base), False) == str(base)
    # prior record itself contended: overwriting it is fine
    base.write_text(json.dumps({"machine": {"contended": True}}))
    assert bench._details_path(str(base), True) == str(base)
    # unreadable prior record: treat as non-authoritative, overwrite
    base.write_text("not json")
    assert bench._details_path(str(base), True) == str(base)
