"""train_watchdog.sh forwards SIGTERM to the trainer child, and the
bench/trainer arbitration protocol (bench.py _tpu_arbitration <->
watchdog BENCH_LOCK/TRAINER_PIDFILE) pauses the right process.

A campaign-level `timeout` signals only the watchdog process; without the
trap an orphaned trainer kept running and starved the next stage on the
shared TPU (observed live in round 3, stage 2). And without arbitration,
the driver's round-end bench.py could run against a pool busy with a
supervisor-chain quality trainer, recording contention as the headline.
"""
import os, signal, subprocess, sys, tempfile, time

def test_watchdog_term_kills_trainer_child():
    with tempfile.TemporaryDirectory() as d:
        fake = os.path.join(d, "fake_trainer.py")
        pidfile = os.path.join(d, "trainer.pid")
        with open(fake, "w") as f:
            f.write(
                "import os,sys,time\n"
                f"open({pidfile!r},'w').write(str(os.getpid()))\n"
                "time.sleep(120)\n")
        log = os.path.join(d, "log")
        # Isolate the arbitration files: without this, a REAL bench lock
        # held by a concurrent TPU session blocks wait_bench (the fake
        # trainer never launches), and the watchdog would clobber the
        # real /tmp pidfile with the fake trainer's pid.
        env = {**os.environ,
               "BENCH_LOCK": os.path.join(d, "bench.lock"),
               "TRAINER_PIDFILE": os.path.join(d, "wd_trainer.pid")}
        wd = subprocess.Popen(
            ["bash", "scripts/train_watchdog.sh", fake, "unused.yaml", log, "1"],
            cwd="/root/repo", env=env)
        for _ in range(100):
            if os.path.exists(pidfile) and open(pidfile).read().strip():
                break
            time.sleep(0.1)
        trainer_pid = int(open(pidfile).read())
        os.kill(wd.pid, signal.SIGTERM)
        wd.wait(timeout=10)
        for _ in range(50):
            try:
                os.kill(trainer_pid, 0)
            except ProcessLookupError:
                return  # child is gone - pass
            time.sleep(0.1)
        os.kill(trainer_pid, signal.SIGKILL)
        raise AssertionError("trainer child survived watchdog SIGTERM")


def _proc_state(pid):
    with open(f"/proc/{pid}/stat") as f:
        return f.read().rsplit(")", 1)[1].split()[0]


def test_bench_arbitration_pauses_and_resumes_trainer(monkeypatch, tmp_path):
    """bench.py's _tpu_arbitration must SIGSTOP the trainer recorded in
    TRAINER_PIDFILE for the duration of the bench and SIGCONT it after,
    and must create/remove BENCH_LOCK around the measurement."""
    sys.path.insert(0, "/root/repo")
    import bench

    fake = subprocess.Popen([sys.executable, "-c", "import time; time.sleep(60)"])
    try:
        pidfile = tmp_path / "trainer.pid"
        lock = tmp_path / "bench.lock"
        pidfile.write_text(str(fake.pid))
        monkeypatch.setattr(bench, "TRAINER_PIDFILE", str(pidfile))
        monkeypatch.setattr(bench, "BENCH_LOCK", str(lock))
        monkeypatch.delenv("BENCH_NO_ARBITRATION", raising=False)

        with bench._tpu_arbitration():
            assert lock.exists() and lock.read_text() == str(os.getpid())
            for _ in range(50):
                if _proc_state(fake.pid) == "T":
                    break
                time.sleep(0.05)
            assert _proc_state(fake.pid) == "T"  # paused during the bench
        assert not lock.exists()
        for _ in range(50):
            if _proc_state(fake.pid) != "T":
                break
            time.sleep(0.05)
        assert _proc_state(fake.pid) != "T"  # resumed after

        # kill-switch: no lock, no pause
        monkeypatch.setenv("BENCH_NO_ARBITRATION", "1")
        with bench._tpu_arbitration():
            assert not lock.exists()
            assert _proc_state(fake.pid) != "T"
    finally:
        fake.kill()
        fake.wait()


def test_watchdog_holds_launch_while_bench_lock_held(tmp_path):
    """train_watchdog.sh must not (re)launch the trainer while a live
    bench holds BENCH_LOCK, and must launch promptly once it clears.
    Stale locks (dead owner) are cleared rather than waited on."""
    fake = tmp_path / "fake_trainer.py"
    started = tmp_path / "started"
    fake.write_text(
        "import sys,time\n"
        f"open({str(started)!r},'w').write('x')\n"
        "time.sleep(60)\n")
    log = tmp_path / "log"
    lock = tmp_path / "bench.lock"
    pidfile = tmp_path / "trainer.pid"
    lock.write_text(str(os.getpid()))  # held by a live process (us)

    env = dict(os.environ, BENCH_LOCK=str(lock), BENCH_LOCK_POLL="1",
               TRAINER_PIDFILE=str(pidfile))
    wd = subprocess.Popen(
        ["bash", "scripts/train_watchdog.sh", str(fake), "unused.yaml",
         str(log), "1"], cwd="/root/repo", env=env)
    try:
        time.sleep(2.0)
        assert not started.exists()  # held back by the lock
        assert "bench lock held" in log.read_text()
        lock.unlink()
        deadline = time.time() + 10
        while not started.exists() and time.time() < deadline:
            time.sleep(0.1)
        assert started.exists()      # launched once the lock cleared
        assert pidfile.exists()      # pid published for the bench side
        assert _proc_state(int(pidfile.read_text())) in ("S", "R")
    finally:
        os.kill(wd.pid, signal.SIGTERM)
        wd.wait(timeout=10)


def test_watchdog_clears_stale_bench_lock(tmp_path):
    """A lock whose owner is dead must be cleared, not waited on forever."""
    fake = tmp_path / "fake_trainer.py"
    started = tmp_path / "started"
    fake.write_text(
        f"open({str(started)!r},'w').write('x')\n")
    log = tmp_path / "log"
    lock = tmp_path / "bench.lock"
    # an owner pid that is certainly dead (recently-exited child)
    dead = subprocess.Popen([sys.executable, "-c", "pass"])
    dead.wait()
    lock.write_text(str(dead.pid))

    env = dict(os.environ, BENCH_LOCK=str(lock), BENCH_LOCK_POLL="1",
               TRAINER_PIDFILE=str(tmp_path / "trainer.pid"))
    wd = subprocess.Popen(
        ["bash", "scripts/train_watchdog.sh", str(fake), "unused.yaml",
         str(log), "1"], cwd="/root/repo", env=env)
    try:
        deadline = time.time() + 10
        while not started.exists() and time.time() < deadline:
            time.sleep(0.1)
        assert started.exists()
        assert not lock.exists()
    finally:
        os.kill(wd.pid, signal.SIGTERM)
        wd.wait(timeout=10)
