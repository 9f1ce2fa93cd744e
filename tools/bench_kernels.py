"""Compiler-drift gate for the hand-written kernel stack (VERDICT r3
item 8): A/B every optional transform — phase-fold stem (fast path),
FusedStem Pallas kernel, FusedELAN Pallas kernel — against plain XLA on
the CURRENT toolchain, and record whether today's defaults match today's
measurements.

Background: both Pallas kernels were measured as wins, then the remote
XLA compiler moved (2026-08-18) and FusedELAN's win evaporated (PARITY.md
postmortem). Hand kernels vs XLA must be re-benched whenever the
toolchain moves; this tool makes that a one-command check, run each
round, appending to KERNELS.json.

Usage:  python tools/bench_kernels.py [--iters 10] [--out KERNELS.json]
Exit status 1 when the measured best variant disagrees with the shipped
defaults (i.e. defaults leave performance on the table).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

BATCH, IMG = 32, 640


def build_variants():
    """(name, plan, params, state) per transform stack, built on host CPU."""
    from yolo_series_tpu.models.faststem import make_fast_stem
    from yolo_series_tpu.models.model import Model
    from yolo_series_tpu.models.reparam import fuse_model
    from yolo_series_tpu.ops.pallas_elan import make_pallas_elan
    from yolo_series_tpu.ops.pallas_stem import make_pallas_stem

    cpu = jax.local_devices(backend="cpu")[0]
    out = []
    with jax.default_device(cpu):
        m = Model.from_yaml("yolo_series_tpu/models/cfg/deploy/yolov7.yaml")
        base = fuse_model(m.plan, m.params, m.state)

        out.append(("plain_xla", m.plan, *base))
        out.append(("fast_stem", *make_fast_stem(m.plan, *base, max_pairs=2)))
        fs = make_fast_stem(m.plan, *base, max_pairs=2)
        out.append(("fast_stem+pallas_elan",
                    *make_pallas_elan(*fs, force=True)))
        out.append(("pallas_stem",
                    *make_pallas_stem(m.plan, *base, force=True)))
        from yolo_series_tpu.models.fastconcat import make_split_concat
        out.append(("fast_stem+split_concat",
                    make_split_concat(fs[0]), fs[1], fs[2]))
    return out


def bench_variant(plan, params, state, iters):
    from yolo_series_tpu.models.model import apply_model
    from yolo_series_tpu.ops.nms import fused_head_nms
    from yolo_series_tpu.utils.chiprate import chip_rate

    tpu = jax.devices()[0]
    params = jax.device_put(params, tpu)
    state = jax.device_put(state, tpu)
    head = plan.head
    hp = params["layers"][len(plan.layers) - 1]

    @jax.jit
    def end2end(x):
        xf = x.astype(jnp.bfloat16) / jnp.bfloat16(255.0)
        feats, _ = apply_model(plan, params, state, xf, training=False,
                               dtype=jnp.bfloat16, return_head_inputs=True)
        return fused_head_nms(head, hp, feats, conf_thres=0.25,
                              iou_thres=0.45, max_det=300, max_nms=256,
                              compute_dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    x = jax.device_put(
        jnp.asarray(rng.integers(0, 255, (BATCH, IMG, IMG, 3), np.uint8)),
        tpu)
    out = end2end(x)
    _ = np.asarray(out[0])  # compile + settle
    per_batch = chip_rate(end2end, x, iters=iters)
    return per_batch


def bench_w6(iters_serve=10, iters_train=4):
    """w6@1280 serve/train base-vs-lane_align rows (VERDICT r4 next-#8:
    keep the P6 numbers measured every round, not round-3 citations)."""
    from tools.exp_split_concat import measure_serve, measure_train

    cfg_d = "yolo_series_tpu/models/cfg/deploy/yolov7-w6.yaml"
    cfg_t = "yolo_series_tpu/models/cfg/training/yolov7-w6.yaml"
    rows = {}
    for variant in ("base", "lane"):
        s = measure_serve(cfg_d, 8, 1280, iters_serve, variant)
        rows[f"w6_serve_{variant}"] = {
            "ms_per_batch": round(s * 1000, 2),
            "img_per_s": round(8 / s, 1)}
        print(f"w6_serve_{variant:18s} {s * 1000:8.2f} ms/batch  "
              f"{8 / s:8.1f} img/s")
    for variant in ("base", "lane"):
        s = measure_train(cfg_t, 4, 1280, iters_train, variant)
        rows[f"w6_train_{variant}"] = {
            "ms_per_step": round(s * 1000, 2),
            "img_per_s": round(4 / s, 1)}
        print(f"w6_train_{variant:18s} {s * 1000:8.2f} ms/step   "
              f"{4 / s:8.1f} img/s")
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--out", default=str(REPO / "KERNELS.json"))
    ap.add_argument("--w6", action="store_true",
                    help="also measure the w6@1280 serve/train "
                         "base-vs-lane_align rows (slow: 4 big compiles)")
    args = ap.parse_args()

    results = {}
    for name, plan, params, state in build_variants():
        t0 = time.time()
        per_batch = bench_variant(plan, params, state, args.iters)
        results[name] = {"ms_per_batch": round(per_batch * 1000.0, 2),
                         "img_per_s": round(BATCH / per_batch, 1),
                         "wall_s": round(time.time() - t0, 1)}
        print(f"{name:24s} {results[name]['ms_per_batch']:8.2f} ms/batch  "
              f"{results[name]['img_per_s']:8.1f} img/s")

    # Derive the DEFAULT stack from the same env gates ServingEngine's
    # passes consult (pallas passes are env-gated no-ops unless enabled;
    # split_concat is a constructor opt-in, default False) so the gate
    # can't silently compare against a stale baseline if defaults change.
    import os
    if os.environ.get("YOLO_TPU_PALLAS_STEM", "0") == "1":
        default = "pallas_stem"
    elif os.environ.get("YOLO_TPU_PALLAS_ELAN", "0") == "1":
        default = "fast_stem+pallas_elan"
    else:
        default = "fast_stem"
    best = min(results, key=lambda k: results[k]["ms_per_batch"])
    # tolerate 2% noise before declaring drift
    drift = (results[best]["ms_per_batch"]
             < results[default]["ms_per_batch"] * 0.98)
    record = {
        "date": time.strftime("%Y-%m-%d"),
        "jax": jax.__version__,
        "device": str(jax.devices()[0]),
        "batch": BATCH, "img": IMG, "iters": args.iters,
        "results": results,
        "default_stack": default,
        "best_stack": best,
        "defaults_optimal": not drift,
    }
    if args.w6:
        # separate key: w6 rows are bs8@1280 serve / bs4 train and must
        # not enter the yolov7 bs32@640 best/drift comparison above
        record["w6"] = bench_w6(iters_serve=args.iters)
    out_path = Path(args.out)
    history = []
    if out_path.exists():
        try:
            history = json.loads(out_path.read_text())
            if isinstance(history, dict):
                history = [history]
        except Exception:  # noqa: BLE001
            history = []
    history.append(record)
    out_path.write_text(json.dumps(history, indent=1))
    print(json.dumps(record))
    if drift:
        print(f"DRIFT: '{best}' beats the default '{default}' — "
              "re-evaluate the kernel defaults", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
