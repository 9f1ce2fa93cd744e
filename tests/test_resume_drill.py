"""Kill-and-relaunch resume drill (VERDICT r1 item 10): train in a
subprocess, SIGKILL it mid-run, let the tools/resume_runs.py scanner
relaunch it from last.ckpt + opt.yaml, and verify the run completes in the
SAME run dir (reference utils/aws/resume.py:13-37 + train.py:203-228)."""

import os
import pickle
import signal
import subprocess
import sys
import time
from pathlib import Path

import numpy as np
import pytest
import yaml


def _make_toyset(root: Path, n=8):
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from tools.bench_loader import make_synthetic_dataset

    files = make_synthetic_dataset(root, n, hw=(160, 200))
    (root / "train.txt").write_text("\n".join(files))
    (root / "val.txt").write_text("\n".join(files[:2]))
    dy = root / "data.yaml"
    yaml.safe_dump({"train": str(root / "train.txt"),
                    "val": str(root / "val.txt"),
                    "nc": 80, "names": [f"c{i}" for i in range(80)]},
                   open(dy, "w"))
    return dy


@pytest.mark.slow
def test_kill_and_scanner_relaunch(tmp_path):
    dy = _make_toyset(tmp_path / "data")
    project = tmp_path / "runs"
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

    cmd = [sys.executable, "-m", "yolo_series_tpu.cli.train",
           "--cfg", "yolo_series_tpu/models/cfg/training/yolov7-tiny.yaml",
           "--data", str(dy), "--img-size", "64", "--batch-size", "4",
           "--nbs", "4", "--epochs", "4", "--noval",
           "--project", str(project), "--name", "drill"]
    # stdout goes to a FILE, not a PIPE: nobody drains the pipe while we
    # poll for the checkpoint, and XLA's per-cache-load warnings alone can
    # fill the 64 KB pipe buffer and deadlock the trainer mid-startup
    log_path = tmp_path / "trainer.log"
    log_f = open(log_path, "wb")
    proc = subprocess.Popen(cmd, env=env, cwd=str(Path.cwd()),
                            stdout=log_f, stderr=subprocess.STDOUT)

    # wait for at least one completed epoch checkpoint, then SIGKILL
    last = project / "drill" / "weights" / "last.ckpt"
    deadline = time.time() + 600
    try:
        while time.time() < deadline:
            if last.exists():
                try:
                    blob = pickle.load(open(last, "rb"))
                    if blob.get("epoch", -1) >= 0:
                        break
                except Exception:
                    pass  # mid-write
            if proc.poll() is not None:
                out = log_path.read_text(errors="replace")
                raise AssertionError(f"trainer exited early:\n{out[-3000:]}")
            time.sleep(2.0)
        else:
            raise AssertionError("no checkpoint within deadline")
    finally:
        if proc.poll() is None:
            proc.send_signal(signal.SIGKILL)
            proc.wait()
        log_f.close()

    run_dir = project / "drill"
    assert not (run_dir / "DONE").exists()
    killed_epoch = pickle.load(open(last, "rb"))["epoch"]

    # the scanner finds the interrupted run and relaunches it to completion
    r = subprocess.run(
        [sys.executable, "tools/resume_runs.py", "--root", str(project)],
        env=env, cwd=str(Path.cwd()), capture_output=True, text=True,
        timeout=900)
    assert "resuming" in r.stdout, r.stdout + r.stderr

    assert (run_dir / "DONE").exists(), (
        f"run not completed after relaunch:\n{r.stdout[-2000:]}\n"
        f"{r.stderr[-3000:]}")
    final = pickle.load(open(last, "rb"))
    # train-end strips last.ckpt to deploy form (reference strip_optimizer
    # sets epoch=-1 and drops the optimizer, train.py:520-524)
    assert final["epoch"] == -1
    assert final["opt_state"] is None
    assert killed_epoch >= 0  # the mid-run ckpt was NOT stripped (resumable)
    # trajectory continued in the SAME dir: results rows cover all epochs
    rows = [yaml.safe_load(l) for l in
            (run_dir / "results.jsonl").read_text().splitlines()]
    epochs_seen = {r2.get("epoch") for r2 in rows if "epoch" in r2}
    assert 3 in epochs_seen

    # scanner is idempotent: a second pass finds nothing to resume
    r2 = subprocess.run(
        [sys.executable, "tools/resume_runs.py", "--root", str(project)],
        env=env, cwd=str(Path.cwd()), capture_output=True, text=True,
        timeout=120)
    assert "resuming" not in r2.stdout
