"""Log-stall watchdog for long tunnel-bound runs.

The axon TPU tunnel has no RPC deadline: if the remote runtime restarts
mid-transfer (observed r5 during a post-eval checkpoint fetch), the client
call blocks forever and the whole training process hangs silently.  Every
long phase of the trainer now logs progress (step lines every 50 steps,
"evaluating", "checkpoint[tag]: fetching"), so liveness == the log file's
mtime advancing.  This supervisor restarts the command when the log stalls;
the supervised commands are all resumable (northstar.py train resumes from
last.ckpt), so a restart costs at most one epoch of work.

Usage:
  python tools/watchdog.py --name northstar_train --log runs/northstar_run/train_log.txt \
      [--stall-s 900] [--max-restarts 5] -- python tools/northstar.py train --epochs 8

Also registers the child's pgid in runs/bench_pause/<name>.pid (the bench.py
pause contract, see tools/bgjob.sh); a child in SIGSTOP state ('T') is never
treated as stalled.
"""

from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def child_state(pid: int) -> str:
    try:
        with open(f"/proc/{pid}/stat") as f:
            return f.read().split(") ", 1)[1].split()[0]
    except OSError:
        return "X"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--name", required=True)
    ap.add_argument("--log", required=True, help="file whose mtime proves liveness")
    ap.add_argument("--stall-s", type=float, default=900.0)
    ap.add_argument("--max-restarts", type=int, default=5)
    ap.add_argument("cmd", nargs=argparse.REMAINDER)
    a = ap.parse_args()
    cmd = a.cmd[1:] if a.cmd and a.cmd[0] == "--" else a.cmd
    assert cmd, "no command given"
    log = Path(a.log)
    pidfile = REPO / "runs" / "bench_pause" / f"{a.name}.pid"
    pidfile.parent.mkdir(parents=True, exist_ok=True)

    restarts = 0
    while True:
        start = time.time()
        proc = subprocess.Popen(cmd, start_new_session=True)
        pidfile.write_text(str(proc.pid))
        try:
            while True:
                try:
                    rc = proc.wait(timeout=30)
                    break
                except subprocess.TimeoutExpired:
                    pass
                if child_state(proc.pid) == "T":
                    continue  # paused by bench.py, not stalled
                mtime = log.stat().st_mtime if log.exists() else start
                if time.time() - max(mtime, start) > a.stall_s:
                    print(f"[watchdog] {a.name}: log stalled "
                          f">{a.stall_s:.0f}s, killing pgid {proc.pid}",
                          flush=True)
                    os.killpg(proc.pid, signal.SIGKILL)
                    rc = proc.wait()
                    rc = -1
                    break
        finally:
            pidfile.unlink(missing_ok=True)
        if rc == 0:
            print(f"[watchdog] {a.name}: completed ok", flush=True)
            return 0
        restarts += 1
        if restarts > a.max_restarts:
            print(f"[watchdog] {a.name}: giving up after {restarts - 1} restarts",
                  flush=True)
            return 1
        print(f"[watchdog] {a.name}: rc={rc}, restart {restarts}/{a.max_restarts}",
              flush=True)
        time.sleep(10)


if __name__ == "__main__":
    sys.exit(main())
