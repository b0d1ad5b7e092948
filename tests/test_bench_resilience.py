"""bench.py must print its ONE JSON line no matter what the tunnel does.

Round-3 postmortem: BENCH_r03.json recorded rc=1 with zero output because
the axon backend was down at capture time and bench.py had no defense.
These tests pin the orchestrator's contract (all device work lives in
subprocesses, mocked here — no backend is touched):

  * backend permanently down  -> recorded fallback line, ``"live": false``
  * headline live, extras dead -> live headline + recorded extras, marked
  * all live, LUT wins        -> headline promotes to ``lut_compiled``
"""

import importlib.util
import io
import json
import os
import sys
from unittest import mock

import pytest

_BENCH = os.path.join(os.path.dirname(__file__), os.pardir, "bench.py")


@pytest.fixture()
def bench():
    spec = importlib.util.spec_from_file_location("bench_under_test", _BENCH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _run_main(bench):
    buf, err = io.StringIO(), io.StringIO()
    with mock.patch.object(sys, "stdout", buf), \
            mock.patch.object(sys, "stderr", err):
        bench.main()
    line = buf.getvalue().strip().splitlines()[-1]
    return json.loads(line)


def test_backend_down_emits_marked_fallback(bench):
    down = (None, "Unable to initialize backend 'axon': UNAVAILABLE")
    with mock.patch.object(bench, "_run_child", return_value=down) as rc, \
            mock.patch.object(bench.time, "sleep") as slept:
        d = _run_main(bench)
    # each attempt burns only the cheap PROBE child (a down tunnel hangs,
    # so the full-timeout headline must never be attempted against it)
    assert rc.call_count == bench.HEADLINE_ATTEMPTS
    assert all(c.args[0] == "--probe" for c in rc.call_args_list)
    assert slept.call_count == bench.HEADLINE_ATTEMPTS - 1
    assert d["live"] is False
    assert "UNAVAILABLE" in d["live_error"]
    assert d["metric"] == "ttnet_small_imagenet_eval_throughput"
    assert d["value"] > 0 and d["vs_baseline"] > 0
    assert "recorded" in d["source"]


def test_headline_live_extras_dead_uses_recorded_extras(bench):
    def child(flag, timeout_s):
        if flag == "--probe":
            return {"ok": True}, None
        if flag == "--headline":
            return {"conv_b256_ips": 7290.0}, None
        return None, "timeout after 900s"

    with mock.patch.object(bench, "_run_child", side_effect=child):
        d = _run_main(bench)
    assert d["live"] is True and d["mode"] == "conv_f32"
    assert d["value"] == 7290.0
    # recorded extras are present but clearly marked and never promoted
    assert "extras_source" in d and d["lut_b256_ips"] > d["value"]


def test_all_live_lut_win_promotes_headline(bench):
    def child(flag, timeout_s):
        if flag == "--probe":
            return {"ok": True}, None
        if flag == "--headline":
            return {"conv_b256_ips": 7290.0}, None
        return {"lut_b256_ips": 7760.0, "lut_b1_ms": 1.45,
                "conv_b1_ms": 3.3, "conv_bf16_b256_ips": 7600.0}, None

    with mock.patch.object(bench, "_run_child", side_effect=child):
        d = _run_main(bench)
    assert d["live"] is True
    assert d["mode"] == "lut_compiled" and d["value"] == 7760.0
    assert d["conv_b256_ips"] == 7290.0  # conv stays visible


def test_run_child_survives_garbage_subprocess(bench):
    # a child that prints no JSON must yield (None, stderr-tail), not raise
    with mock.patch.object(bench.subprocess, "run") as run:
        run.return_value = mock.Mock(returncode=1, stdout="",
                                     stderr="Traceback ...\nRuntimeError: x")
        out, err = bench._run_child("--headline", 5)
    assert out is None and "RuntimeError" in err
