"""Training-convergence A/B for optim.lowmem (bf16 Adam/EMA state + SR).

The accuracy gate demanded by the round-4 verdict (Next #3): the lowmem
train step may only ship as a throughput win if it converges like fp32 —
same val accuracy at the same epoch count, same seeds, same data. Runs the
demo-config pipeline twice on CPU and writes
``evidence/lowmem_convergence_ab.json``.

Usage: python scripts/lowmem_ab.py [--work /tmp/lowmem_ab] [--epochs 6]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_arm(work: str, name: str, epochs: int, extra: list) -> dict:
    log_dir = os.path.join(work, name)
    cmd = [sys.executable, "-m", "ladine_tpu.cli.main", "--cpu", "--demo",
           "--train", "--n_epochs", str(epochs), "--timesteps", "10",
           "--seed", "42", "--exp", log_dir, "--doc", "ab", *extra]
    print(f"[lowmem_ab] {' '.join(cmd)}", file=sys.stderr)
    out = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
    if out.returncode != 0:
        raise RuntimeError(f"{name} arm failed:\n{out.stderr[-3000:]}")
    last = None
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{") and line.endswith("}"):
            try:
                last = json.loads(line)
            except json.JSONDecodeError:
                pass
    if last is None:
        raise RuntimeError(f"{name} arm printed no summary JSON")
    return last


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/lowmem_ab")
    ap.add_argument("--epochs", type=int, default=6)
    args = ap.parse_args()
    os.makedirs(args.work, exist_ok=True)

    fp32 = run_arm(args.work, "fp32", args.epochs, [])
    lowm = run_arm(args.work, "lowmem", args.epochs,
                   ["--set", "optim.lowmem=true"])

    def acc(r):
        return r.get("best_accuracy") or r.get("best_val_accuracy")

    result = {
        "what": ("training-convergence A/B for optim.lowmem: demo config, "
                 "identical seeds/data/epochs, fp32 Adam+EMA vs bf16 state "
                 "with stochastic rounding (train/lowmem.py)"),
        "epochs": args.epochs,
        "fp32": fp32,
        "lowmem": lowm,
        "val_acc_fp32": acc(fp32),
        "val_acc_lowmem": acc(lowm),
        "gate": "lowmem within 2 acc points of fp32 at equal epochs",
        "pass": (acc(fp32) is not None and acc(lowm) is not None
                 and acc(lowm) >= acc(fp32) - 2.0),
    }
    out_path = os.path.join(REPO, "evidence", "lowmem_convergence_ab.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({k: result[k] for k in
                      ("val_acc_fp32", "val_acc_lowmem", "pass")}))


if __name__ == "__main__":
    main()
