"""The bench must be un-losable: exactly one parseable headline JSON line
on stdout and rc=0 in EVERY outcome, including the tunnel wedge modes that
lost round 4's official perf record (driver timeout, ``parsed: null``) —
(a) backend init hangs, (b) probe succeeds then the first compile/execute
hangs mid-run, (c) the child dies before printing anything.

bench.py's supervisor (no JAX state, cannot wedge) is driven here with a
fake child (``BENCH_FAKE_CHILD``) standing in for the measurement process,
so every deadline/fallback path runs offline in seconds."""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # subprocess tier (see pyproject markers)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

LAST_GOOD = {"metric": "train_step_rays_per_sec_per_chip",
             "value": 123456.0, "unit": "rays/s", "vs_baseline": 0.1235}


def _run_bench(tmp_path, fake_child, extra_env=None, timeout=120,
               last_good=True):
    if last_good:
        with open(tmp_path / "BENCH_LAST_GOOD.json", "w") as f:
            json.dump(LAST_GOOD, f)
    env = dict(os.environ)
    env["BENCH_SKIP_PROBE"] = "1"
    env["BENCH_FAKE_CHILD"] = fake_child
    env.update(extra_env or {})
    return subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                          cwd=tmp_path, env=env, capture_output=True,
                          text=True, timeout=timeout)


def _json_lines(stdout):
    out = []
    for line in stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            out.append(json.loads(line))
    return out


def test_healthy_child_headline_streams_through(tmp_path):
    body = ("import json; print(json.dumps({'metric': 'm', 'value': 1.0, "
            "'unit': 'rays/s', 'vs_baseline': 0.1}))")
    r = _run_bench(tmp_path, body, last_good=False)
    assert r.returncode == 0, r.stderr
    lines = _json_lines(r.stdout)
    assert len(lines) == 1 and lines[0]["metric"] == "m"


def test_mid_run_wedge_falls_back_to_stale_headline(tmp_path):
    # child hangs before producing the headline (the round-5 wedge mode:
    # probe OK, first compile never returns)
    r = _run_bench(tmp_path, "import time; time.sleep(600)",
                   extra_env={"BENCH_HEADLINE_DEADLINE_S": "3"})
    assert r.returncode == 0, r.stderr
    lines = _json_lines(r.stdout)
    assert len(lines) == 1
    assert lines[0]["value"] == LAST_GOOD["value"]
    assert lines[0]["stale"] is True and "wedge" in lines[0]["stale_reason"]


def test_post_headline_hang_keeps_fresh_headline_and_rc0(tmp_path):
    # headline printed, then a diagnostic/editing stage hangs: supervisor
    # must kill the child at the total deadline and still exit 0 with the
    # FRESH line (no stale duplicate)
    # generous total deadline: child python startup alone can take seconds
    # on this box's single CPU core when the full suite runs alongside
    body = ("import json, time; print(json.dumps({'metric': 'm', "
            "'value': 2.0, 'unit': 'rays/s', 'vs_baseline': 0.2}), "
            "flush=True); time.sleep(600)")
    r = _run_bench(tmp_path, body,
                   extra_env={"BENCH_BUDGET_S": "12",
                              "BENCH_TOTAL_GRACE_S": "8"})
    assert r.returncode == 0, r.stderr
    lines = _json_lines(r.stdout)
    assert len(lines) == 1 and lines[0]["value"] == 2.0
    assert "stale" not in lines[0]


def test_child_early_death_falls_back(tmp_path):
    r = _run_bench(tmp_path, "import sys; sys.exit(3)")
    assert r.returncode == 0, r.stderr
    lines = _json_lines(r.stdout)
    assert len(lines) == 1 and lines[0]["stale"] is True


def test_child_early_death_no_fallback_propagates_rc(tmp_path):
    r = _run_bench(tmp_path, "import sys; sys.exit(3)", last_good=False)
    assert r.returncode == 3
    assert _json_lines(r.stdout) == []
