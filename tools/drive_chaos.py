#!/usr/bin/env python3
"""Live chaos drive (round-5 VERDICT item 6): fault-inject a REAL
`tools/train_24p.py` run on the chip and verify the recovery story the
unit tests pin piece-by-piece (`test_ckpt_portability.py`,
`test_advice_fixes.py`) composes end to end:

  A. `kill -9` the trainer the instant an epoch's checkpoint save starts
     (the save runs right after the "epoch N done" log line); restart
     with `--resume`; training continues from a saved epoch.  Repeated
     to scatter kills across the serialize/swap window.
  B. Reproduce the exact mid-swap filesystem state (ckpt renamed to
     .old, new ckpt not yet renamed in — the one-syscall window in
     `checkpoint.py:save_checkpoint`) and verify the loader's `.old`
     fallback resumes the run.
  C. Kill ONE data worker mid-epoch.  Two legitimate outcomes, both
     verified: results keep flowing from the surviving worker (grace —
     training continues), or the dead worker's in-flight batch is lost
     and the loader raises its worker-death error (clean failure, not a
     hang).  Then kill ALL workers on a fresh run (must fail with the
     worker-death error), and `--resume` recovers and completes through
     the L1 tail (the 24p schedule's analogue of the bbox no-aug
     switch: L1_epoch=10 of max_epoch=30 -> epochs 21-30 run the L1
     program).

Usage:  python tools/drive_chaos.py [--out /tmp/eop_chaos]
Prints a PASS/FAIL summary per phase; exit code 0 iff all pass.
"""

from __future__ import annotations

import argparse
import os
import random
import re
import shutil
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = "/tmp/fisheye_coco/train2017"
LABELS = "/tmp/fisheye_labels"


def child_pids(pid: int):
    """Direct children of ``pid`` via /proc (no pattern matching)."""
    kids = []
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat") as f:
                fields = f.read().split()
            if int(fields[3]) == pid:
                kids.append(int(d))
        except (OSError, IndexError, ValueError):
            continue
    return kids


def start_trainer(out_dir, log_path, max_epoch, resume=False):
    cmd = [
        sys.executable, "tools/train_24p.py",
        "-f", "load_train/yolox_24p_train.py", "-b", "8", "-l", "0.01",
        "--data-dir", DATA, "--label-dir", LABELS,
        "--max-epoch", str(max_epoch),
    ]
    if resume:
        cmd.append("--resume")
    cmd += ["num_classes", "3", "input_size", "(256,256)",
            "test_size", "(256,256)", "data_num_workers", "2",
            "L1_epoch", "10", "eval_interval", "1000",
            "output_dir", out_dir]
    log = open(log_path, "ab")
    return subprocess.Popen(cmd, cwd=REPO, stdout=log, stderr=log,
                            start_new_session=True)


def wait_for(log_path, needle, timeout, start_ofs=0, proc=None,
             allow_exit=False):
    """Poll the log until ``needle`` appears after ``start_ofs``;
    returns the offset just past the match, or -1 on timeout/death."""
    deadline = time.time() + timeout
    while time.time() < deadline:
        try:
            with open(log_path, "rb") as f:
                f.seek(start_ofs)
                data = f.read()
        except OSError:
            data = b""
        i = data.find(needle.encode())
        if i >= 0:
            return start_ofs + i + len(needle)
        if proc is not None and not allow_exit and proc.poll() is not None:
            return -1
        if proc is not None and allow_exit and proc.poll() is not None:
            # one final read after exit
            with open(log_path, "rb") as f:
                f.seek(start_ofs)
                data = f.read()
            i = data.find(needle.encode())
            return start_ofs + i + len(needle) if i >= 0 else -1
        time.sleep(0.05)
    return -1


def log_size(log_path):
    try:
        return os.path.getsize(log_path)
    except OSError:
        return 0


def hard_kill(proc):
    try:
        os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
    except ProcessLookupError:
        pass
    proc.wait()


def read_log(log_path, ofs=0):
    try:
        with open(log_path, "rb") as f:
            f.seek(ofs)
            return f.read().decode(errors="replace")
    except OSError:
        return ""


def first_epoch_done(log_path, ofs):
    """First 'epoch N done' after ofs (1-based)."""
    m = re.search(r"epoch (\d+) done", read_log(log_path, ofs))
    return int(m.group(1)) if m else -1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/eop_chaos")
    ap.add_argument("--kills", type=int, default=3)
    args = ap.parse_args()

    assert os.path.isdir(DATA) and os.path.isdir(LABELS), (
        "synthetic 24p set missing — run tools/make_synth_datasets.py coco "
        "+ tools/labels_create_24p.py first (round-4 drive layout)")

    shutil.rmtree(args.out, ignore_errors=True)
    os.makedirs(args.out)
    log_path = os.path.join(args.out, "chaos_log.txt")
    ckpt_dir = os.path.join(args.out, "yolox_24p")
    ckpt = os.path.join(ckpt_dir, "last_epoch_ckpt")
    results = {}
    notes = []

    # -------- Phase A: kill -9 at checkpoint-save time, resume --------
    proc = start_trainer(args.out, log_path, max_epoch=30)
    ofs = wait_for(log_path, "done in", 2400, proc=proc)
    ok_a = ofs > 0
    resumes = 0
    for k in range(args.kills):
        if not ok_a:
            break
        # the per-epoch save runs immediately after the "epoch N done"
        # line; a small random delay scatters the kill across the
        # gather/serialize/swap window
        ofs2 = wait_for(log_path, "done in", 900, start_ofs=ofs, proc=proc)
        if ofs2 < 0:
            ok_a = False
            break
        time.sleep(random.uniform(0.0, 0.8))
        hard_kill(proc)
        state = sorted(os.listdir(ckpt_dir)) if os.path.isdir(ckpt_dir) \
            else []
        print(f"[A] kill {k}: ckpt_dir after SIGKILL: {state}", flush=True)
        resume_ofs = log_size(log_path)
        proc = start_trainer(args.out, log_path, max_epoch=30, resume=True)
        if wait_for(log_path, "loading checkpoint", 600,
                    start_ofs=resume_ofs, proc=proc) < 0:
            ok_a = False
            break
        got = wait_for(log_path, "done in", 2400, start_ofs=resume_ofs,
                       proc=proc)
        if got < 0:
            ok_a = False
            break
        ep = first_epoch_done(log_path, resume_ofs)
        print(f"[A] resumed; first completed epoch {ep}", flush=True)
        ok_a = ok_a and ep >= 1
        resumes += 1
        ofs = got
    results["A_kill9_at_save_then_resume"] = ok_a and resumes == args.kills
    notes.append(f"A: {resumes} SIGKILLs at save time, each resumed")

    # ------- Phase B: exact mid-swap state -> .old fallback -------
    # (the window between `os.replace(path, old)` and
    #  `os.replace(tmp, path)` — reproduce it exactly, then resume)
    hard_kill(proc)
    ok_b = os.path.isdir(ckpt)
    if ok_b:
        old = ckpt + ".old"
        if os.path.isdir(old):
            shutil.rmtree(old)
        os.replace(ckpt, old)
        resume_ofs = log_size(log_path)
        proc = start_trainer(args.out, log_path, max_epoch=30, resume=True)
        saw_fallback = wait_for(log_path, ".old", 600,
                                start_ofs=resume_ofs, proc=proc) > 0
        trained = wait_for(log_path, "done in", 2400,
                           start_ofs=resume_ofs, proc=proc) > 0
        ep = first_epoch_done(log_path, resume_ofs)
        print(f"[B] .old fallback used={saw_fallback}, first completed "
              f"epoch after resume={ep}", flush=True)
        ok_b = saw_fallback and trained and ep >= 1
    results["B_mid_swap_old_fallback_resume"] = ok_b
    notes.append("B: mid-swap state reproduced, .old fallback resumed")

    # ------- Phase C: worker deaths, then resume through the L1 tail -------
    # C1: one worker killed mid-epoch
    ofs = log_size(log_path)
    if proc.poll() is not None:
        proc = start_trainer(args.out, log_path, max_epoch=30, resume=True)
        wait_for(log_path, "done in", 2400, start_ofs=ofs, proc=proc)
    kids = child_pids(proc.pid)
    ok_c1 = bool(kids)
    outcome = "no-workers-found"
    if ok_c1:
        os.kill(kids[0], signal.SIGKILL)
        print(f"[C] killed one worker {kids[0]} of {kids}", flush=True)
        mark = log_size(log_path)
        got = wait_for(log_path, "done in", 120, start_ofs=mark, proc=proc)
        if got > 0:
            outcome = "grace-continued"
        else:
            # legitimate alternative: the dead worker's in-flight batch
            # was lost -> the loader must RAISE its worker-death error
            # (clean failure, never a hang)
            t0 = time.time()
            while proc.poll() is None and time.time() - t0 < 300:
                time.sleep(0.2)
            tail = read_log(log_path, max(0, log_size(log_path) - 20000))
            ok_c1 = proc.poll() is not None and "died" in tail
            outcome = "clean-worker-death-error" if ok_c1 else "hang"
        print(f"[C] single-worker-kill outcome: {outcome}", flush=True)
    results["C1_single_worker_death_grace_or_clean_error"] = ok_c1

    # C2: all workers killed -> the loader's worker-death error, always
    if proc.poll() is None and not ok_c1:
        hard_kill(proc)  # never start a second trainer on the held chip
    if proc.poll() is not None:
        mark = log_size(log_path)
        proc = start_trainer(args.out, log_path, max_epoch=30, resume=True)
        wait_for(log_path, "done in", 2400, start_ofs=mark, proc=proc)
    for pid in child_pids(proc.pid):
        try:
            os.kill(pid, signal.SIGKILL)
        except ProcessLookupError:
            pass
    print("[C] killed ALL workers", flush=True)
    t0 = time.time()
    while proc.poll() is None and time.time() - t0 < 300:
        time.sleep(0.2)
    tail = read_log(log_path, max(0, log_size(log_path) - 20000))
    ok_c2 = proc.poll() is not None and "died" in tail
    print(f"[C] all-workers kill -> trainer exited rc={proc.poll()} "
          f"with worker-death error: {ok_c2}", flush=True)
    results["C2_all_workers_death_clean_error"] = ok_c2

    # C3: resume -> completes through the L1 tail (epochs 21-30)
    if proc.poll() is None:
        hard_kill(proc)  # free the chip before the resume run
    resume_ofs = log_size(log_path)
    proc = start_trainer(args.out, log_path, max_epoch=30, resume=True)
    try:
        rc = proc.wait(timeout=3600)
    except subprocess.TimeoutExpired:
        hard_kill(proc)
        rc = -1
    seg = read_log(log_path, resume_ofs)
    eps = [int(m) for m in re.findall(r"epoch (\d+) done", seg)]
    ok_c3 = rc == 0 and eps and max(eps) == 30 and any(e > 20 for e in eps)
    print(f"[C] final resume rc={rc}, epochs completed {min(eps or [0])}"
          f"..{max(eps or [0])} (L1 tail = 21..30)", flush=True)
    results["C3_resume_completes_through_L1_tail"] = ok_c3
    notes.append(f"C: single-kill outcome={outcome}; all-kill clean error; "
                 f"resumed to epoch {max(eps or [0])}")

    if proc.poll() is None:
        hard_kill(proc)

    print("\n==== chaos drive summary ====")
    for k, v in results.items():
        print(f"{'PASS' if v else 'FAIL'}  {k}")
    for n in notes:
        print(" - " + n)
    sys.exit(0 if all(results.values()) else 1)


if __name__ == "__main__":
    main()
