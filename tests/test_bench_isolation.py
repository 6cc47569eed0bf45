"""Unit tests for bench.py's grouped child-process isolation (VERDICT r4 #1).

The driver's official record depends on ``--mode all`` merging every
child's incremental JSON into one headline line; these tests pin the
merge, the skip markers, and the budget floor without touching a chip
(subprocess.run is monkeypatched).
"""

import json
import subprocess
import time

import pytest

import bench


class _Result:
    def __init__(self, stdout, rc=0):
        self.stdout = stdout
        self.returncode = rc


def _collect(monkeypatch, fake_run, budget_s=10_000.0):
    monkeypatch.setattr(subprocess, "run", fake_run)
    extras = {}
    emits = []
    bench._isolated_all(
        budget_s, time.time(), extras, lambda: emits.append(dict(extras))
    )
    return extras, emits


def test_merges_child_extras(monkeypatch):
    calls = []

    def fake_run(cmd, **kw):
        calls.append(cmd)
        modes = cmd[cmd.index("--mode") + 1].split(",")
        child = {"extras": {}}
        for m in modes:
            for name in bench._MODE_METRICS[m]:
                child["extras"][name] = 123.4
        child["extras"]["bench_wall_s"] = 99.0  # must NOT leak to parent
        return _Result(json.dumps(child) + "\n")

    extras, emits = _collect(monkeypatch, fake_run)
    assert len(calls) == len(bench._CHILD_GROUPS)
    for group, _ in bench._CHILD_GROUPS:
        for m in group:
            for name in bench._MODE_METRICS[m]:
                assert extras[name] == 123.4
    # the child's own wall must not overwrite the parent's
    assert "bench_wall_s" not in extras
    assert len(emits) == len(bench._CHILD_GROUPS)


def test_partial_child_gets_rc_markers(monkeypatch):
    def fake_run(cmd, **kw):
        # child produced one metric then died rc=1
        return _Result(
            json.dumps({"extras": {"encode_bf16_imgs_per_sec": 800.0}}) + "\n",
            rc=1,
        )

    extras, _ = _collect(monkeypatch, fake_run)
    assert extras["encode_bf16_imgs_per_sec"] == 800.0
    # every other metric of every group carries the rc marker
    assert extras["encode_int8_imgs_per_sec"] == "rc_1"
    assert extras["train_step_imgs_per_sec"] == "rc_1"


def test_timeout_killed_marks_and_continues(monkeypatch):
    seen = []

    def fake_run(cmd, **kw):
        modes = cmd[cmd.index("--mode") + 1].split(",")
        seen.append(modes)
        if "encode" in modes:
            raise subprocess.TimeoutExpired(cmd, kw.get("timeout", 0),
                                            output=b"")
        child = {"extras": {name: 5.0 for m in modes
                            for name in bench._MODE_METRICS[m]}}
        return _Result(json.dumps(child) + "\n")

    monkeypatch.setattr(time, "sleep", lambda s: None)  # skip the cooldown
    extras, _ = _collect(monkeypatch, fake_run)
    # every group ran, plus exactly one retry of the killed encode child
    assert len(seen) == len(bench._CHILD_GROUPS) + 1
    assert seen[-1] == ["encode"]
    assert extras["encode_bf16_imgs_per_sec"] == "timeout_killed"
    assert extras["train_step_imgs_per_sec"] == 5.0


def test_retry_lands_the_number(monkeypatch):
    calls = {"encode": 0}

    def fake_run(cmd, **kw):
        modes = cmd[cmd.index("--mode") + 1].split(",")
        if modes == ["encode"]:
            calls["encode"] += 1
            if calls["encode"] == 1:  # first attempt wedges
                raise subprocess.TimeoutExpired(cmd, kw.get("timeout", 0),
                                                output=b"")
        child = {"extras": {name: 7.5 for m in modes
                            for name in bench._MODE_METRICS[m]}}
        return _Result(json.dumps(child) + "\n")

    monkeypatch.setattr(time, "sleep", lambda s: None)
    extras, _ = _collect(monkeypatch, fake_run)
    assert calls["encode"] == 2
    # the retry's number replaced the first attempt's kill marker
    assert extras["encode_bf16_imgs_per_sec"] == 7.5


def test_budget_floor_skips_groups(monkeypatch):
    def fake_run(cmd, **kw):  # pragma: no cover - must not be called
        pytest.fail("child spawned despite exhausted budget")

    extras, _ = _collect(monkeypatch, fake_run, budget_s=1.0)
    for group, _ in bench._CHILD_GROUPS:
        for m in group:
            for name in bench._MODE_METRICS[m]:
                assert extras[name] == "skipped_budget"


def test_groups_cover_all_modes_exactly_once():
    flat = [m for group, _ in bench._CHILD_GROUPS for m in group]
    assert sorted(flat) == sorted(bench._MODE_METRICS)
    assert len(flat) == len(set(flat))


def test_child_dispatch_runs_requested_modes(monkeypatch):
    """A comma-mode child invocation dispatches exactly the requested
    bench functions (CPU; bench fns stubbed so no model builds)."""
    import sys

    called = []

    def stub(name):
        def fn(*a, **kw):
            called.append((name, kw.get("qf_int8", kw.get("int8", False))))
            return 1.0, {}
        return fn

    for fn_name in ["bench_encode", "bench_encode_int8", "bench_query",
                    "bench_train", "bench_train_cached", "bench_rerank",
                    "bench_encode_eva_int8", "bench_index",
                    "bench_index_local"]:
        monkeypatch.setattr(bench, fn_name, stub(fn_name))
    monkeypatch.setenv("SPRC_BENCH_CHILD", "1")
    monkeypatch.setenv("SPRC_BENCH_BUDGET_S", "100000")
    monkeypatch.setattr(sys, "argv",
                        ["bench.py", "--mode", "train,rerank_int8,query"])
    # children hard-exit after the final emit (remote-client teardown can
    # hang); intercept so pytest survives
    exited = []
    monkeypatch.setattr(bench.os, "_exit", lambda code: exited.append(code))
    bench.main()
    assert exited == [0]
    names = [c[0] for c in called]
    assert names == ["bench_query", "bench_train", "bench_rerank"]
    # the rerank call carried the int8 flag, the query call did not
    assert called[2][1] is True
    assert called[0][1] is False
