"""Driver bench-artifact contract (VERDICT r4 #1).

Bare `python bench.py` must STREAM: print each metric's one-line JSON
record the moment its sub-bench completes (resnet first -- the driver
parses the first line into BENCH_r*.json), rewrite the artifact after
every sub-bench, and skip not-yet-started sub-benches once the wall-clock
budget expires. Round 4 batched all printing after the full suite; the
driver timed out mid-suite and the round shipped no parsed perf number
(BENCH_r04.json rc=124, parsed:null).
"""

import json
import time

import pytest

import bench


def _run(monkeypatch, capsys, tmp_path, plan, budget=None):
    monkeypatch.setattr(bench, "_bench_plan", lambda path: plan)
    out = tmp_path / "bench_full.json"
    artifact = bench.bench_all(str(out), budget_s=budget, stream=True)
    lines = [json.loads(l) for l in
             capsys.readouterr().out.strip().splitlines()]
    return artifact, lines, out


def _entry(name, runner):
    return (name, runner,
            lambda r: bench._line(name, bench._get(r, name), "unit"))


def test_streaming_prints_line_per_subbench(monkeypatch, capsys, tmp_path):
    order = []
    plan = [_entry("first", lambda: order.append("first") or 1.0),
            _entry("second", lambda: order.append("second") or 2.0)]
    artifact, lines, out = _run(monkeypatch, capsys, tmp_path, plan)
    # one line per sub-bench, in plan order, plus the trailing status line
    assert [l["metric"] for l in lines] == ["first", "second",
                                            "bench_suite_status"]
    assert lines[0]["value"] == 1.0
    assert lines[-1]["skipped"] == []
    assert json.loads(out.read_text())["results"] == artifact["results"]


def test_failure_is_fenced_not_fatal(monkeypatch, capsys, tmp_path):
    def boom():
        raise RuntimeError("sub-bench exploded")
    plan = [_entry("bad", boom), _entry("good", lambda: 3.0)]
    artifact, lines, _ = _run(monkeypatch, capsys, tmp_path, plan)
    assert "error" in artifact["results"]["bad"]
    # the fenced failure still emits its line (value null) and the suite
    # continues to the next sub-bench
    assert [l["metric"] for l in lines][:2] == ["bad", "good"]
    assert lines[0]["value"] is None
    assert lines[1]["value"] == 3.0


def test_budget_skips_unstarted_but_never_the_headline(
        monkeypatch, capsys, tmp_path):
    def slow():
        time.sleep(0.05)
        return 1.0
    plan = [_entry("headline", slow), _entry("tail", lambda: 2.0)]
    # budget 0: already expired before the first sub-bench, which must
    # still run (a too-small budget must never blank the artifact)
    artifact, lines, out = _run(monkeypatch, capsys, tmp_path, plan,
                                budget=0.0)
    assert artifact["results"]["headline"] == 1.0
    assert artifact["results"]["tail"] == {"skipped": "budget"}
    assert lines[0]["metric"] == "headline" and lines[0]["value"] == 1.0
    assert lines[-1]["metric"] == "bench_suite_status"
    assert lines[-1]["skipped"] == ["tail"]
    # the skipped sub-bench is recorded in the artifact too
    assert json.loads(out.read_text())["results"]["tail"] == {
        "skipped": "budget"}


def test_artifact_written_incrementally(monkeypatch, capsys, tmp_path):
    """A hard kill mid-suite must still leave a valid artifact prefix."""
    out = tmp_path / "bench_full.json"
    seen = {}

    def check_then_fail():
        # by the time sub-bench 2 RUNS, sub-bench 1's result is on disk
        seen.update(json.loads(out.read_text())["results"])
        raise KeyboardInterrupt

    plan = [_entry("first", lambda: 7.0), _entry("second", check_then_fail)]
    monkeypatch.setattr(bench, "_bench_plan", lambda path: plan)
    with pytest.raises(KeyboardInterrupt):
        bench.bench_all(str(out), stream=True)
    assert seen == {"first": 7.0}


def test_real_plan_headline_is_resnet_and_emitters_are_wired(capsys):
    """The production plan leads with resnet (the driver parses the first
    line) and every emitter prints a record keyed into its own result."""
    plan = bench._bench_plan("bench_full.json")
    names = [name for name, _, _ in plan]
    assert names[0] == "resnet152_fps"
    assert len(names) == len(set(names))
    # emitters never crash on an all-errors results dict (the fence
    # guarantees results[name] exists even on failure)
    results = {name: {"error": "x"} for name in names}
    results["resnet152_fps"] = 6200.0
    for name, _, emitter in plan:
        emitter(results)
    lines = [json.loads(l) for l in
             capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == len(plan)
    first = lines[0]
    assert first["metric"] == "resnet152_feature_extraction_throughput"
    assert first["value"] == 6200.0
    assert first["vs_baseline"] == pytest.approx(6200.0 / 5000.0)
    # every record carries the driver-contract keys
    for rec in lines:
        assert {"metric", "value", "unit", "vs_baseline"} <= set(rec)
