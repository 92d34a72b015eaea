"""Stall-proof runner for chip-facing proof scripts.

The axon tunnel can block a single device call indefinitely (observed
repeatedly since round 3: a program that completes in under a minute on
retry hung >16 minutes, futex-parked in a transfer) and the remote
worker can crash mid-run. bench.py carries its own supervisor; this is
the same pattern for the standalone proof scripts (scale_25k,
opf_scale, opf_pegase):

  * the parent never imports JAX;
  * the child runs in its own process group with line-buffered output
    teed to the parent's stdout and a log file;
  * any new output counts as progress — no output for ``--ceiling``
    seconds, or ``--deadline`` seconds overall, kills the process GROUP
    (never a pattern kill) and retries up to ``--retries`` times.

Usage:
  python benchmarks/supervise.py --ceiling 1800 --deadline 5400 \
      --retries 1 --log /tmp/run.log -- python benchmarks/scale_25k.py
"""

import argparse
import os
import signal
import subprocess
import sys
import time


def run_once(cmd, ceiling, deadline_at, log_f):
    proc = subprocess.Popen(
        cmd, start_new_session=True, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT)
    os.set_blocking(proc.stdout.fileno(), False)
    last_progress = time.monotonic()
    buf = ""
    while True:
        time.sleep(1.0)
        try:
            raw = proc.stdout.read()
        except (OSError, ValueError):
            raw = None
        chunk = raw.decode(errors="replace") if raw else ""
        if chunk:
            last_progress = time.monotonic()
            sys.stdout.write(chunk)
            sys.stdout.flush()
            log_f.write(chunk)
            log_f.flush()
            buf += chunk
        rc = proc.poll()
        if rc is not None:
            return rc, buf, None
        now = time.monotonic()
        why = None
        if now - last_progress > ceiling:
            why = f"no output in {ceiling:.0f}s (tunnel stall?)"
        elif now > deadline_at:
            why = "overall deadline"
        if why:
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except ProcessLookupError:
                pass
            proc.wait()
            return None, buf, why


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ceiling", type=float, default=1800.0,
                    help="max seconds without any child output")
    ap.add_argument("--deadline", type=float, default=5400.0,
                    help="overall wall budget across all attempts")
    ap.add_argument("--retries", type=int, default=1)
    ap.add_argument("--log", default="")
    ap.add_argument("cmd", nargs=argparse.REMAINDER)
    args = ap.parse_args()
    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        print("supervise: no command given", file=sys.stderr)
        sys.exit(2)
    log_path = args.log or "/tmp/supervise.log"
    deadline_at = time.monotonic() + args.deadline
    with open(log_path, "a") as log_f:
        for attempt in range(args.retries + 1):
            log_f.write(f"\n=== supervise attempt {attempt} : "
                        f"{' '.join(cmd)} ===\n")
            rc, _, why = run_once(cmd, args.ceiling, deadline_at, log_f)
            if rc is not None:
                print(f"[supervise] child exited rc={rc} "
                      f"(attempt {attempt})", file=sys.stderr)
                sys.exit(rc)
            print(f"[supervise] killed child: {why} (attempt {attempt})",
                  file=sys.stderr)
            log_f.write(f"[supervise] killed: {why}\n")
            if time.monotonic() > deadline_at:
                break
    print("[supervise] gave up", file=sys.stderr)
    sys.exit(3)


if __name__ == "__main__":
    main()


# Cited behavior this guards against: BENCH_NOTES.md round-3/4 tunnel
# findings; reference-scale envelope being proven is
# /root/reference/docs/src/examples/powerSystemDatasets.md:5-18.
