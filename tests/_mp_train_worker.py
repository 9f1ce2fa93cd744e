"""Multi-process training drill worker (VERDICT r3 item 4).

Run as one process of an N-process jax.distributed CPU job (the TPU
analog of one rank of the reference's torch.distributed.launch multi-node
DDP, train.py:579-613 / utils/aws/resume.py:29-37):

  python tests/_mp_train_worker.py <process_id> <num_processes> <port> <out> \
      [steps] [resume_ckpt|-] [marker|-]

Each process owns 4 virtual CPU devices; the global mesh spans all
processes. The GLOBAL batch is derived from one shared seed; each process
feeds only its host_local_slice (DistributedSampler semantics), runs the
same jitted train step over the global mesh (XLA's collectives replace
NCCL allreduce), and process 0 writes the checkpoint (rank-0-only save,
reference train.py:464) which the launching test compares against a
single-process run.

Extended drill args (VERDICT r4 next-#6, reference train.py:579-613 +
utils/aws/resume.py:29-37): `steps` runs that many steps; `resume_ckpt`
(if not '-') loads params/opt state in EVERY process before training and
continues the global step count; `marker` (if not '-') is a file process
0 touches right after the mid-run mp_resume.ckpt save — the launcher
SIGKILLs the whole job when it appears (the kill-resume drill). Process 0
also runs an eval-mode forward per "epoch" (every 3 steps) and appends
the mean objectness sigmoid to evals.txt — the rank-0-only periodic eval
(reference train.py:417-438 notest branch).
"""

import os
import sys

N_LOCAL_DEVICES = 4


def main():
    pid, nproc, port, out = (int(sys.argv[1]), int(sys.argv[2]),
                             int(sys.argv[3]), sys.argv[4])
    steps = int(sys.argv[5]) if len(sys.argv) > 5 else 3
    resume = sys.argv[6] if len(sys.argv) > 6 and sys.argv[6] != "-" else None
    marker = sys.argv[7] if len(sys.argv) > 7 and sys.argv[7] != "-" else None
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={N_LOCAL_DEVICES}")

    import jax

    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

    from yolo_series_tpu.parallel.mesh import (
        global_batch_from_host_local, host_local_slice, init_distributed,
        make_mesh, replicated, sync_processes)

    if nproc > 1:
        init_distributed(f"localhost:{port}", nproc, pid)
    n_global = N_LOCAL_DEVICES * nproc
    assert len(jax.devices()) == n_global, (len(jax.devices()), n_global)

    import numpy as np
    import jax.numpy as jnp

    from yolo_series_tpu.losses import LossHyp, make_compute_loss
    from yolo_series_tpu.models.model import Model
    from yolo_series_tpu.train.optim import OptimConfig
    from yolo_series_tpu.train.schedules import warmup_factors
    from yolo_series_tpu.train.step import init_train_state, make_train_step

    GLOBAL_BATCH, IMG, STEPS = 8, 64, steps

    m = Model.from_yaml(
        "yolo_series_tpu/models/cfg/training/yolov7-tiny.yaml",
        key=jax.random.PRNGKey(7))
    loss_fn = make_compute_loss(m.plan.head, LossHyp())
    cfg = OptimConfig(lr0=0.01)

    mesh = make_mesh(n_data=n_global)
    step0 = 0
    if resume is not None:
        # cross-process resume: EVERY process loads the same rank-0
        # checkpoint from shared disk — params, BN state, optimizer and
        # EMA — then re-replicates over the global mesh (reference
        # resume: train.py:70-86 via opt.resume + ckpt['optimizer'])
        from yolo_series_tpu.train.checkpoints import (load_checkpoint,
                                                       restore_train_state)
        ck = load_checkpoint(resume)
        ts = restore_train_state(ck, cfg)
        step0 = int(ck["cfg"].get("mp_step", 0))
    else:
        ts = init_train_state(m.params, m.state, cfg)
    ts = jax.device_put(ts, replicated(mesh))
    step_fn = make_train_step(m.plan, loss_fn, cfg, mesh=mesh,
                              compute_dtype=jnp.float32)

    # fixed eval batch for the rank-0 periodic eval
    ev_rng = np.random.default_rng(5555)
    ev_x = jnp.asarray(ev_rng.uniform(0, 1, (2, IMG, IMG, 3)), jnp.float32)

    def rank0_eval():
        # eval-mode forward with the CURRENT params on process-0's local
        # device (the replicated global arrays are host-addressable)
        from yolo_series_tpu.models.model import apply_model
        p = jax.tree_util.tree_map(lambda a: np.asarray(a), ts.params)
        s = jax.tree_util.tree_map(lambda a: np.asarray(a), ts.state)
        out, _ = apply_model(m.plan, p, s, ev_x)
        return float(jnp.mean(jax.nn.sigmoid(out["raw"][0][..., 4])))

    losses = []
    for i in range(step0, step0 + STEPS):
        # the GLOBAL batch for step i, identical in every process ...
        rng = np.random.default_rng(1000 + i)
        x = rng.uniform(0, 1, (GLOBAL_BATCH, IMG, IMG, 3)).astype(np.float32)
        labels = np.zeros((GLOBAL_BATCH, 8, 5), np.float32)
        labels[:, :2, 0] = rng.integers(0, 80, (GLOBAL_BATCH, 2))
        labels[:, :2, 1:3] = rng.uniform(0.3, 0.7, (GLOBAL_BATCH, 2, 2))
        labels[:, :2, 3:5] = rng.uniform(0.1, 0.3, (GLOBAL_BATCH, 2, 2))
        mask = np.zeros((GLOBAL_BATCH, 8), bool)
        mask[:, :2] = True
        # ... but each process materializes ONLY its host-local slice
        sl = host_local_slice(GLOBAL_BATCH)
        batch = global_batch_from_host_local(
            mesh, {"x": x[sl], "labels": labels[sl], "mask": mask[sl]})
        lr_groups, mom = warmup_factors(
            jnp.float32(100 + i), 10, jnp.float32(1.0), 300, cfg.lr0, 0.1,
            0.1, 0.8, cfg.momentum)
        ts, metrics = step_fn(ts, batch["x"], batch["labels"],
                              batch["mask"], lr_groups, mom)
        losses.append(float(metrics["total"]))
        if i == 0 and jax.process_index() == 0:
            # step-1 snapshot: the parity gate. (Later steps only sanity-
            # check: train-mode BN amplifies fp32 reduction-order noise
            # ~1e-2/step — see PARITY.md "BN chaos amplification" — so
            # exact multi-step trajectories differ between XLA process
            # layouts by design.)
            from yolo_series_tpu.train.checkpoints import save_checkpoint
            save_checkpoint(os.path.join(out, "mp_step1.ckpt"), ts,
                            cfg={"mp_drill": True}, half=False)
        if jax.process_index() == 0 and (i + 1) % 3 == 0:
            # rank-0 periodic eval (reference train.py:417-438) + save
            with open(os.path.join(out, "evals.txt"), "a") as f:
                f.write(f"{i + 1} {rank0_eval():.8f}\n")
            from yolo_series_tpu.train.checkpoints import save_checkpoint
            save_checkpoint(os.path.join(out, "mp_resume.ckpt"), ts,
                            cfg={"mp_drill": True, "mp_step": i + 1},
                            half=False)
            if marker is not None:
                with open(marker, "w") as f:
                    f.write(str(i + 1))
        with open(os.path.join(out, f"loss_p{pid}.txt"), "a") as f:
            f.write(f"{i} {losses[-1]:.8f}\n")

    sync_processes("steps-done")
    if jax.process_index() == 0:
        # process-0 checkpoint (reference rank-0-only save, train.py:464)
        from yolo_series_tpu.train.checkpoints import save_checkpoint
        save_checkpoint(os.path.join(out, "mp_last.ckpt"), ts,
                        cfg={"mp_drill": True}, half=False)
        with open(os.path.join(out, "losses.txt"), "w") as f:
            f.write(" ".join(f"{v:.8f}" for v in losses))
    sync_processes("ckpt-done")
    print(f"worker {pid}/{nproc} done; losses={losses}")


if __name__ == "__main__":
    main()
