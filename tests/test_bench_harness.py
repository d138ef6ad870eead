"""Bench-harness integrity smokes (VERDICT r3 item 1).

The driver runs ``python bench.py``, captures the combined output stream,
and parses the LAST JSON line of the tail. Rounds 2-3 produced
``parsed=null`` because children's XLA C++ log spam (multi-KB per line,
``cpu_aot_loader.cc`` cross-machine AOT loads) was piped straight through
the parent and flooded the tail. These tests prove the three defenses:

1. child stderr is quarantined to bench_logs/, never the parent's stream;
2. TF_CPP_MIN_LOG_LEVEL force-assigned into a child env silences XLA C++
   logging completely (0 stderr bytes from a cache-loading child);
3. the parent's combined stream ends with a parseable consolidated JSON
   line even when a child spews ~256 KB of synthetic spam.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _parse_tail(captured: str):
    """The driver's parse: last line that decodes as a JSON object wins."""
    parsed = None
    for line in captured.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                parsed = json.loads(line)
            except ValueError:
                pass
    return parsed


def test_selftest_noisy_child_cannot_flood_parent_stream(tmp_path):
    """A child spewing 256 KB of AOT-style spam to stderr must not reach
    the parent's combined output; the tail must end with consolidated
    JSON carrying the child's stage key."""
    env = dict(os.environ)
    env["BENCH_SELFTEST"] = "1"
    # never clobber the tracked BENCH_FULL.json / bench_logs (ADVICE r4)
    env["BENCH_OUT_DIR"] = str(tmp_path)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=300, env=env, cwd=REPO,
    )
    combined = proc.stdout + proc.stderr
    assert proc.returncode == 0, combined[-2000:]
    # the synthetic spam pattern must appear nowhere in the parent stream
    assert "machine-feature mismatch spam" not in combined
    # parent stderr stays small: notes only (spam would be ~256 KB)
    assert len(proc.stderr) < 4096, proc.stderr[:1000]
    # the LAST ~1.5 KB (a driver-sized tail snapshot) must contain the
    # consolidated JSON (heartbeat/final emit)
    parsed = _parse_tail(combined[-1500:])
    assert parsed is not None, combined[-1500:]
    assert parsed.get("selftest_noise") == 1.0
    # and it is quarantined to the log file instead — under BENCH_OUT_DIR
    log = os.path.join(str(tmp_path), "bench_logs", "selftest.log")
    assert os.path.exists(log)
    with open(log) as f:
        assert "machine-feature mismatch spam" in f.read()
    assert os.path.exists(os.path.join(str(tmp_path), "BENCH_FULL.json"))


def test_tf_cpp_min_log_level_assignment_silences_xla():
    """silence_xla_clogs() must force-assign (not setdefault) and the
    resulting child env must produce ZERO stderr bytes from XLA C++
    logging — the r3 fix shipped unverified and demonstrably failed."""
    from viet_tts_tpu.utils.compile_cache import silence_xla_clogs

    env = {"TF_CPP_MIN_LOG_LEVEL": "0"}  # the adversarial parent env
    out = silence_xla_clogs(env)
    assert out["TF_CPP_MIN_LOG_LEVEL"] == "3"

    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from viet_tts_tpu.utils.compile_cache import enable_persistent_cache\n"
        "enable_persistent_cache()\n"
        "import jax.numpy as jnp\n"
        "x = jnp.ones((64, 64))\n"
        "print('OK', float(jax.jit(lambda a: (a @ a).sum())(x)))\n"
    )
    child_env = silence_xla_clogs(dict(os.environ))
    child_env["JAX_PLATFORMS"] = "cpu"
    p = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=300, env=child_env, cwd=REPO,
    )
    assert p.returncode == 0, p.stderr[-2000:]
    assert "OK" in p.stdout
    # C++ logging fully silenced; allow a little slack for Python warnings
    assert len(p.stderr) < 1024, p.stderr[:2000]


def test_cpu_cache_dir_is_machine_keyed():
    from viet_tts_tpu.utils.compile_cache import cache_dir, machine_fingerprint

    fp = machine_fingerprint()
    assert fp and len(fp) <= 16
    assert cache_dir("cpu").endswith(f"cpu-{fp}")
    # TPU cache stays shared across hosts (device code is portable)
    assert cache_dir("tpu") == os.path.dirname(cache_dir("cpu"))


def test_build_result_carries_required_keys():
    """The consolidated line must expose the judge's minimum key set when
    the corresponding stages have landed."""
    sys.path.insert(0, REPO)
    import bench

    acc = {
        "jets_samples_per_sec": 1e6,
        "rtf_jets": 0.001,
        "mfu_jets": 0.4,
        "sec_per_batch_reference_cpu_fs2_hifigan": 10.0,
        "sec_per_batch_two_stage": 0.1,
        "sec_per_step_reference_cpu_train_fs2": 5.0,
        "train_fs2_sec_per_step": 0.5,
        "mcd_vs_reference": 0.0001,
        "platform": "tpu",
    }
    result = bench.build_result(acc)
    assert result["vs_baseline"] == 100.0
    assert result["train_vs_baseline"] == 10.0
    for key in ("rtf_jets", "mfu_jets", "mcd_vs_reference"):
        assert key in result
    # round-trips as one JSON line
    line = json.dumps(result)
    assert json.loads(line) == result


def test_mixed_provenance_ratio_falls_back_to_seed_pair():
    """A derived ratio whose inputs straddle seed/live was never measured
    in one environment (ADVICE r4): it must fall back to the all-seed pair
    and tag provenance; all-live inputs tag "live"."""
    sys.path.insert(0, REPO)
    import bench

    seeds = {
        "sec_per_step_reference_cpu_train_fs2": 90.8,
        "train_fs2_sec_per_step": 0.2,
    }
    acc = dict(seeds)
    acc["sec_per_step_reference_cpu_train_fs2"] = 40.0  # live re-measure
    result = bench.build_result(
        acc, set(), True,
        live_keys={"sec_per_step_reference_cpu_train_fs2"}, seeds=seeds,
    )
    assert result["train_vs_baseline"] == 454.0
    assert result["train_vs_baseline_provenance"] == "seed"

    result = bench.build_result(
        acc, set(), True, live_keys=set(acc), seeds=seeds,
    )
    assert result["train_vs_baseline"] == 200.0
    assert result["train_vs_baseline_provenance"] == "live"


def test_group_timeout_still_lands_heartbeat_json(tmp_path):
    """Kill-during-stage simulation (ADVICE r4: the old 45s-budget variant
    skipped every group and passed trivially): the child completes _noise,
    then wedges in _hang past the group timeout. The parent must keep
    emitting heartbeat JSON lines mid-hang, and the final tail must carry
    the completed stage's key but not the hung stage's."""
    import time

    env = dict(os.environ)
    env["BENCH_SELFTEST_HANG"] = "1"
    env["BENCH_BUDGET_S"] = "35"      # retry pass is out of budget
    env["BENCH_HANG_TIMEOUT_S"] = "20"  # group timeout: kill mid-hang
    env["BENCH_HEARTBEAT_S"] = "2"
    env["BENCH_OUT_DIR"] = str(tmp_path)
    t0 = time.monotonic()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=240, env=env, cwd=REPO,
    )
    elapsed = time.monotonic() - t0
    assert proc.returncode == 0, (proc.stdout + proc.stderr)[-2000:]
    # the child really hung: the run rode out the full group timeout
    assert elapsed >= 18, elapsed
    json_lines = [
        json.loads(l) for l in proc.stdout.splitlines()
        if l.strip().startswith("{")
    ]
    # initial emit + _noise emit + >=2 heartbeats while _hang wedged
    assert len(json_lines) >= 4, proc.stdout[-2000:]
    # the real driver interleaves the two streams live, so its 2000-char
    # tail ends with stdout's final JSON; subprocess.run concatenates
    # whole streams, so parse stdout's own tail here
    parsed = _parse_tail(proc.stdout[-2000:])
    assert parsed is not None
    assert parsed.get("selftest_noise") == 1.0
    assert "selftest_hang" not in parsed
