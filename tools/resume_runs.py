#!/usr/bin/env python
"""Relaunch interrupted training runs (the utils/aws/resume.py equivalent,
reference utils/aws/resume.py:13-37): scan for last.ckpt files whose run
has no alive trainer, rebuild the train command from the saved opt.yaml /
checkpoint metadata, and exec it.

Usage: python tools/resume_runs.py [--root runs/train] [--dry-run]
"""

import argparse
import pickle
import subprocess
import sys
from pathlib import Path


def find_interrupted(root: Path):
    for last in sorted(root.rglob("last.ckpt")):
        run_dir = last.parent.parent
        done_marker = run_dir / "DONE"
        if done_marker.exists():
            continue
        yield last, run_dir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="runs/train")
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()

    for last, run_dir in find_interrupted(Path(args.root)):
        with open(last, "rb") as f:
            blob = pickle.load(f)
        epoch = blob.get("epoch", -1)
        # the CLI reloads the run's full TrainConfig from its opt.yaml
        # (reference train.py:203-228) — only the checkpoint path is needed
        cmd = [sys.executable, "-m", "yolo_series_tpu.cli.train",
               "--resume", str(last)]
        print(f"resuming {run_dir} from epoch {epoch}: {' '.join(cmd)}")
        if not args.dry_run:
            subprocess.run(cmd, check=False)


if __name__ == "__main__":
    main()
