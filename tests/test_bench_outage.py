"""bench.py outage semantics (VERDICT r3 #1): an infrastructure failure
must produce a structured JSON error line and exit EX_TEMPFAIL (75) --
never a hang, never a bare traceback, and never be confusable with a
correctness-gate failure (exit 1).  These tests drive bench.main() with
the probe/child monkeypatched, so no device is touched."""

import json

import bench


def _last_json_line(capsys):
    out = capsys.readouterr().out.strip().splitlines()
    for line in reversed(out):
        try:
            return json.loads(line)
        except ValueError:
            continue
    raise AssertionError(f"no JSON line in stdout: {out!r}")


def test_probe_failure_emits_structured_error(monkeypatch, capsys):
    monkeypatch.setattr(bench, "probe_tpu", lambda timeout_s=0: None)
    monkeypatch.setattr(bench, "PROBE_ATTEMPTS", 2)
    monkeypatch.setattr(bench, "PROBE_RETRY_SLEEP_S", 0)
    rc = bench.main()
    assert rc == bench.EX_TEMPFAIL
    d = _last_json_line(capsys)
    assert d["error"] == "tpu-unavailable"
    assert d["value"] is None
    assert d["vs_baseline"] is None
    assert "probe" in d["detail"]


def test_cpu_fallback_platform_is_refused(monkeypatch, capsys):
    """A backend that comes up as CPU must not be benched as TPU."""
    monkeypatch.setattr(bench, "probe_tpu", lambda timeout_s=0: "cpu")
    rc = bench.main()
    assert rc == bench.EX_TEMPFAIL
    d = _last_json_line(capsys)
    assert d["error"] == "tpu-unavailable"
    assert "cpu" in d["detail"]


class _FakeRes:
    def __init__(self, returncode, stdout, stderr=""):
        self.returncode = returncode
        self.stdout = stdout
        self.stderr = stderr


def test_child_json_is_relayed_with_child_rc(monkeypatch, capsys):
    monkeypatch.setattr(bench, "probe_tpu", lambda timeout_s=0: "tpu")
    payload = {"value": 163.4, "unit": "Mpaths/s", "correctness": "pass"}
    monkeypatch.setattr(
        bench.subprocess, "run",
        lambda *a, **k: _FakeRes(0, "compile log\n" + json.dumps(payload)))
    rc = bench.main()
    assert rc == 0
    assert _last_json_line(capsys) == payload


def test_correctness_failure_rc_passes_through(monkeypatch, capsys):
    """Exit 1 from the child (correctness gate) must stay exit 1 --
    distinct from infra's 75."""
    monkeypatch.setattr(bench, "probe_tpu", lambda timeout_s=0: "tpu")
    payload = {"value": 10.0, "correctness": "fail:region 3"}
    monkeypatch.setattr(
        bench.subprocess, "run",
        lambda *a, **k: _FakeRes(1, json.dumps(payload)))
    rc = bench.main()
    assert rc == 1
    assert _last_json_line(capsys)["correctness"].startswith("fail")


def test_child_crash_without_json_is_infra(monkeypatch, capsys):
    monkeypatch.setattr(bench, "probe_tpu", lambda timeout_s=0: "tpu")
    monkeypatch.setattr(
        bench.subprocess, "run",
        lambda *a, **k: _FakeRes(1, "", "RuntimeError: UNAVAILABLE"))
    rc = bench.main()
    assert rc == bench.EX_TEMPFAIL
    d = _last_json_line(capsys)
    assert d["error"] == "tpu-unavailable"
    assert "UNAVAILABLE" in d["detail"]


def test_child_timeout_is_infra(monkeypatch, capsys):
    monkeypatch.setattr(bench, "probe_tpu", lambda timeout_s=0: "tpu")

    def _boom(*a, **k):
        raise bench.subprocess.TimeoutExpired(cmd="x", timeout=1)

    monkeypatch.setattr(bench.subprocess, "run", _boom)
    rc = bench.main()
    assert rc == bench.EX_TEMPFAIL
    assert _last_json_line(capsys)["error"] == "tpu-unavailable"
