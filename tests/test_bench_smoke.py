"""bench.py is the driver-recorded metric at every round end — a crash there
loses the round's benchmark record, so its emit paths get a CPU smoke at a
tiny BENCH_SHAPE. Values are not asserted (CPU), only that one well-formed
JSON line with the contract fields comes out.
"""
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(env_extra, timeout=900):
    # T >= 5: the sliding-window init needs at least its window of frames
    # BENCH_NO_ARBITRATION: the smoke must never take the real /tmp bench
    # lock or SIGSTOP a genuine trainer that happens to be running while
    # the suite executes (tests run during live TPU campaigns).
    env = dict(os.environ, JAX_PLATFORMS="cpu", BENCH_SHAPE="8,16,8,2",
               BENCH_ITERS="1", BENCH_REPEATS="1", BENCH_NO_ARBITRATION="1",
               **env_extra)
    env.pop("BENCH_WORKLOAD", None)
    out = subprocess.run([sys.executable, os.path.join(ROOT, "bench.py")],
                         capture_output=True, text=True, env=env,
                         timeout=timeout, cwd=ROOT)
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_bench_default_headline_emits_batched_point():
    """The driver runs bench.py with no env: the default must emit the
    batched TPU operating point with the bs=1 continuity fields riding
    the same line."""
    rec = _run_bench({"BENCH_NO_F32": "1"})
    assert rec["metric"] == "unrolled_resnet_train_throughput"
    assert rec["unit"] == "it/s"
    assert rec["batch"] == 16 and rec["remat"] is True
    assert rec["trunk_dtype"] == "bfloat16"  # round-4 shipped default
    assert rec["value"] > 0
    assert rec["vs_baseline"] > 0
    assert rec["bs1_it_s"] > 0


# The explicit BENCH_BATCH path shares all of its code with the default
# path's _measure_headline calls and is exercised by the round campaign
# scripts; a second ~2-min subprocess smoke is not worth the suite time.


def test_bench_wire_probe_emits_all_three_encodings():
    """BENCH_WORKLOAD=recon_e2e_wire must emit one line per wire encoding
    with the round-4 metric-name contract: the flat (default) wire owns
    the bare compact metric name, dict/flat16 get suffixes, and flat16
    moves half the bytes."""
    import subprocess
    import sys

    env = dict(os.environ, JAX_PLATFORMS="cpu", BENCH_SHAPE="8,16,8,2",
               BENCH_SLICES="2", BENCH_ITERS="1", BENCH_REPEATS="1",
               BENCH_NO_ARBITRATION="1", BENCH_WORKLOAD="recon_e2e_wire")
    out = subprocess.run([sys.executable, os.path.join(ROOT, "bench.py")],
                         capture_output=True, text=True, env=env,
                         timeout=900, cwd=ROOT)
    assert out.returncode == 0, out.stderr[-2000:]
    recs = {json.loads(l)["metric"]: json.loads(l)
            for l in out.stdout.strip().splitlines() if l.startswith("{")}
    base = "unrolled_resnet_recon_e2e_compact"
    assert set(recs) == {f"{base}_dict_throughput", f"{base}_throughput",
                         f"{base}_flat16_throughput"}
    for r in recs.values():
        assert r["value"] > 0 and r["wire_mb_per_slice"] > 0
    assert (recs[f"{base}_flat16_throughput"]["wire_mb_per_slice"]
            < 0.6 * recs[f"{base}_throughput"]["wire_mb_per_slice"])


def test_bench_mesh_sweep_smoke():
    """BENCH_WORKLOAD=mesh on the 8-device virtual CPU mesh (round-4
    verdict #10): one line per mesh factorization with throughput and the
    vs-first-point scaling ratio; an explicit non-dividing point is
    skipped with a note instead of crashing."""
    import subprocess
    import sys

    env = dict(os.environ, JAX_PLATFORMS="cpu", BENCH_SHAPE="8,16,8,2",
               BENCH_ITERS="1", BENCH_REPEATS="1", BENCH_BATCH="8",
               BENCH_NO_ARBITRATION="1", BENCH_WORKLOAD="mesh",
               BENCH_MESH="8x1x1,4x2x1,3x1x1",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    # the axon sitecustomize initializes its backend at interpreter start
    # and pins the device list to the one tunnel chip — strip it so the
    # virtual 8-device CPU platform takes effect
    env["PYTHONPATH"] = ":".join(
        p for p in env.get("PYTHONPATH", "").split(":")
        if p and "axon" not in p) or ROOT
    out = subprocess.run([sys.executable, os.path.join(ROOT, "bench.py")],
                         capture_output=True, text=True, env=env,
                         timeout=900, cwd=ROOT)
    assert out.returncode == 0, out.stderr[-2000:]
    recs = [json.loads(l) for l in out.stdout.strip().splitlines()
            if l.startswith("{")]
    skipped = [r for r in recs if "skipped" in r]
    timed = [r for r in recs if r.get("metric") == "mesh_res_train_throughput"]
    assert len(skipped) == 1 and "3x1x1" in skipped[0]["metric"]
    assert {r["mesh"] for r in timed} == {"8x1x1", "4x2x1"}
    for r in timed:
        assert r["value"] > 0 and r["global_batch"] == 8
    assert timed[0]["vs_first_point"] == 1.0
