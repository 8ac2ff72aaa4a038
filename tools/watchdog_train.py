"""Watchdog driver: run a federated training run THROUGH runtime wedges.

The tunneled dev-TPU worker occasionally wedges mid-dispatch (hangs with no
error; recovers ~2-3 min after the client process dies — see CLAUDE.md).
This driver composes the trainer's per-round resume snapshots (--resume,
--ckpt_iters) into a supervised loop:

  launch cli.train --resume --stop_after TARGET
  watch the run's metrics.jsonl; if it goes stale for --stall_sec, kill the
  child (by pid — never by pattern), wait out the worker recovery, relaunch
  with --resume; stop when TARGET iterations are recorded (or --max_relaunch
  exhausted).

Usage:
  python tools/watchdog_train.py --target 300 --snapshot_root /tmp/model \
      --exp odoc_r3 -- --img_class odoc --strategy FedICRA --procedure ours \
      --model unet_lc_multihead --root_path /root/reference/data \
      --batch_size 12 --iters 10 --rep_iters 3 --alpha 1 --base_lr 0.01
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fedicra_tpu.utils.quiesce import quiesce_requested  # noqa: E402


def child_cpu_ticks(pid: int) -> int:
    """utime+stime of pid from /proc (0 if unreadable)."""
    try:
        with open(f"/proc/{pid}/stat") as f:
            parts = f.read().rsplit(") ", 1)[1].split()
        return int(parts[11]) + int(parts[12])  # fields 14+15, 1-indexed
    except (OSError, IndexError, ValueError):
        return 0


def last_round(metrics_path: str) -> int:
    """Largest round index recorded in metrics.jsonl (0 if absent)."""
    best = 0
    try:
        with open(metrics_path) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue
                best = max(best, int(rec.get("step", rec.get("round", 0))))
    except FileNotFoundError:
        pass
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--target", type=int, required=True,
                    help="global iteration count to reach")
    ap.add_argument("--exp", type=str, required=True)
    ap.add_argument("--snapshot_root", type=str, required=True)
    ap.add_argument("--stall_sec", type=float, default=1800,
                    help="no metrics.jsonl growth for this long => wedged "
                    "(default generous: first ALA round legitimately runs "
                    "many quiet epochs)")
    ap.add_argument("--recover_sec", type=float, default=240,
                    help="wait after killing a wedged child (worker recovery)")
    ap.add_argument("--quiesce_grace", type=float, default=300,
                    help="seconds to let the child finish its round and "
                    "exit on its own after a quiesce request (it polls the "
                    "sentinel at round boundaries) before SIGKILL")
    ap.add_argument("--max_relaunch", type=int, default=40)
    ap.add_argument("--ckpt_iters", type=int, default=10,
                    help="resume-snapshot cadence passed to the trainer")
    ap.add_argument("train_args", nargs=argparse.REMAINDER,
                    help="-- then cli.train args")
    args = ap.parse_args()
    train_args = [a for a in args.train_args if a != "--"]

    snap_dir = os.path.join(args.snapshot_root, args.exp)
    metrics = os.path.join(snap_dir, "metrics.jsonl")
    log_path = os.path.join(args.snapshot_root, f"{args.exp}_watchdog.log")
    os.makedirs(args.snapshot_root, exist_ok=True)

    def plog(msg):
        line = f"[watchdog {time.strftime('%H:%M:%S')}] {msg}"
        print(line, flush=True)
        with open(log_path, "a") as f:
            f.write(line + "\n")

    launches = 0
    while launches < args.max_relaunch:
        reached = last_round(metrics)
        if reached >= args.target:
            plog(f"target {args.target} reached (recorded {reached}); done")
            return 0
        cmd = [
            sys.executable, "-m", "fedicra_tpu.cli.train",
            "--exp", args.exp,
            "--snapshot_root", args.snapshot_root,
            "--ckpt_iters", str(args.ckpt_iters),
            "--stop_after", str(args.target),
            "--resume",
            *train_args,
        ]
        launches += 1
        child_log = os.path.join(
            args.snapshot_root, f"{args.exp}_run{launches}.log"
        )
        plog(f"launch #{launches} (recorded {reached}/{args.target}); "
             f"log {child_log}")
        with open(child_log, "w") as lf:
            child = subprocess.Popen(
                cmd, stdout=lf, stderr=subprocess.STDOUT,
                env={**os.environ, "FEDICRA_VERBOSE": "1"},
            )
        try:
            last_ticks, cpu_fresh_at = -1, time.time()
            while True:
                try:
                    child.wait(timeout=60)
                    break  # exited on its own
                except subprocess.TimeoutExpired:
                    pass
                try:
                    age = time.time() - os.path.getmtime(metrics)
                    logage = time.time() - os.path.getmtime(child_log)
                except OSError:
                    age = logage = 0.0
                # A child that is burning CPU is NOT wedged, whatever the
                # files say: cold starts legitimately go >30 min with no
                # output (data preload + remote compiles), while the known
                # TPU-worker wedge blocks on a dead RPC at ~0% CPU. Track
                # utime+stime from /proc so only a *quiet* child is stale.
                if quiesce_requested():
                    # a benchmark/dryrun asked for the box: the trainer
                    # polls the same sentinel at round boundaries
                    # (server.run stop_fn) and exits rc=0 with a fresh
                    # resume snapshot — give it a grace window before
                    # escalating to SIGKILL (round-4 forensics: the
                    # unconditional SIGKILL here produced the rc=-9 records)
                    plog(f"quiesce requested; waiting up to "
                         f"{args.quiesce_grace:.0f}s for child pid "
                         f"{child.pid} to exit gracefully")
                    try:
                        child.wait(timeout=args.quiesce_grace)
                        plog(f"child exited gracefully rc={child.returncode}")
                    except subprocess.TimeoutExpired:
                        plog(f"grace expired; killing child pid {child.pid}")
                        child.send_signal(signal.SIGKILL)
                        child.wait()
                    while quiesce_requested():
                        time.sleep(15.0)
                    plog("quiesce cleared")
                    break
                ticks = child_cpu_ticks(child.pid)
                if ticks > last_ticks + 5:  # >~50ms CPU since last poll
                    last_ticks, cpu_fresh_at = ticks, time.time()
                cpuage = time.time() - cpu_fresh_at
                # wedge = no file moved AND the process is CPU-idle
                if min(age, logage, cpuage) > args.stall_sec:
                    plog(f"stale for {min(age, logage):.0f}s (cpu idle "
                         f"{cpuage:.0f}s); killing child pid {child.pid}")
                    child.send_signal(signal.SIGKILL)
                    child.wait()
                    break
        except KeyboardInterrupt:
            child.send_signal(signal.SIGTERM)
            child.wait()
            raise
        rc = child.returncode
        reached = last_round(metrics)
        plog(f"child exited rc={rc}; recorded {reached}/{args.target}")
        if reached >= args.target:
            plog("done")
            return 0
        plog(f"waiting {args.recover_sec:.0f}s for worker recovery")
        time.sleep(args.recover_sec)
    plog(f"gave up after {launches} launches")
    return 1


if __name__ == "__main__":
    sys.exit(main())
