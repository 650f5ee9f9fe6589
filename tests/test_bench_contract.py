"""Driver output contract of bench.py (VERDICT r4 weak #1).

The round driver runs ``python bench.py``, merges stdout+stderr, and parses
the LAST JSON line as the recorded metric.  Rounds 3 and 4 lost the headline
to a trailing aux metric (a ~35% understatement of the recorded number), so
bench.py now re-prints the headline record in a ``finally`` as the very last
line.  This test runs the real bench in smoke mode (OGPC_BENCH_SMOKE=1:
tiny timing chains, 1 repeat — ~2 min on CPU) and asserts, on the merged
stream exactly as the driver sees it, that the last JSON line is the
``sintel_sparsematch_throughput`` headline.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_smoke_last_json_line_is_headline():
    env = dict(os.environ)
    env["OGPC_BENCH_SMOKE"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""  # with an empty pool the axon
    # sitecustomize leaves the platform alone and JAX_PLATFORMS=cpu holds
    r = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=REPO,
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,  # merged, like the driver
        text=True,
        timeout=560,
    )
    assert r.returncode == 0, r.stdout[-4000:]
    json_lines = []
    for line in r.stdout.splitlines():
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            json_lines.append(json.loads(line))
        except ValueError:
            continue
    assert json_lines, "bench printed no JSON lines"
    last = json_lines[-1]
    assert last["metric"] == "sintel_sparsematch_throughput", last
    assert last["unit"] == "Mpix/s"
    assert last["value"] > 0
    assert "vs_baseline" in last
    # the early print must also still be there (relay-outage insurance):
    # headline appears at least twice in a completed run
    heads = [j for j in json_lines
             if j.get("metric") == "sintel_sparsematch_throughput"]
    assert len(heads) >= 2 and heads[0] == heads[-1]


def test_bench_env_flag_tolerant_parse():
    """ADVICE r4: OGPC_BENCH_FAST=true / empty must not crash the parse."""
    sys.path.insert(0, REPO)
    import bench

    for val, want in [("", False), ("0", False), ("false", False),
                      ("no", False), ("1", True), ("true", True),
                      ("yes", True), (" 1 ", True)]:
        os.environ["_OGPC_TEST_FLAG"] = val
        assert bench._env_flag("_OGPC_TEST_FLAG") is want, (val, want)
    del os.environ["_OGPC_TEST_FLAG"]
