"""Observability: JSON-line events, phase timers, summary metrics."""

import io
import json

from daccord_tpu.utils.obslog import RunLog


def test_runlog_events_and_summary():
    buf = io.StringIO()
    log = RunLog(enabled=True, stream=buf, run_id="t1")
    with log.phase("front"):
        pass
    log.count("reads", 10)
    log.count("windows", 100)
    s = log.summary()
    lines = [json.loads(x) for x in buf.getvalue().strip().splitlines()]
    kinds = [l["kind"] for l in lines]
    assert kinds == ["phase", "summary"]
    assert lines[0]["name"] == "front"
    assert s["reads"] == 10 and "reads_per_s" in s
    assert "front" in s["phases"]


def test_runlog_disabled_silent():
    buf = io.StringIO()
    log = RunLog(enabled=False, stream=buf)
    with log.phase("x"):
        pass
    log.event("anything", a=1)
    assert buf.getvalue() == ""
