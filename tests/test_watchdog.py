"""train_watchdog.sh forwards SIGTERM to the trainer child.

A campaign-level `timeout` signals only the watchdog process; without the
trap an orphaned trainer kept running and starved the next stage on the
shared TPU (observed live in round 3, stage 2).
"""
import os, signal, subprocess, tempfile, time

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
        wd = subprocess.Popen(
            ["bash", "scripts/train_watchdog.sh", fake, "unused.yaml", log, "1"],
            cwd="/root/repo")
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
