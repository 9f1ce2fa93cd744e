"""Batched serving engine — the TensorRT/Triton replacement.

Replaces the reference deployment chain (export_onnx.py -> TRT engine ->
Triton server, SURVEY.md §2.8.5) with an AOT-compiled XLA executable:

  * fixed (batch, size) forward + decode + on-TPU NMS in one program,
    compiled ahead of time via jit(...).lower(...).compile();
  * response contract identical to the Triton client's
    (deploy/triton-inference-server/client.py:15-16):
    num_dets (B, 1), det_boxes (B, max_det, 4), det_scores (B, max_det),
    det_classes (B, max_det);
  * optional dynamic batching: a queue micro-batcher that pads partial
    batches (the Triton `dynamic_batching` behavior that doubled reference
    throughput, deploy README.md:115-122);
  * bf16 weights path; int8 via infer/quant.py.
"""

from __future__ import annotations

import functools
import queue as queue_mod
import threading
import time
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from yolo_series_tpu.models.model import apply_model
from yolo_series_tpu.ops.nms import _single_image_nms


class ServingEngine:
    """AOT-compiled fixed-shape end-to-end detector."""

    def __init__(self, plan, params, state, *, batch_size=8, img_size=640,
                 conf_thres=0.25, iou_thres=0.45, max_det=100,
                 dtype=jnp.bfloat16, max_nms=1024, fast_stem=True,
                 pallas_elan=True, split_concat=False,
                 ingest_hw: Optional[tuple] = None, pack_output=False):
        """ingest_hw=(h, w): accept RAW camera-shaped uint8 frames and
        letterbox ON DEVICE (data/device_aug.make_device_letterbox) —
        camera bytes to detections in one program; detections are
        rescaled back to source pixels before returning."""
        if fast_stem:
            # whole-stem Pallas kernel where the graph matches (P5 stems,
            # ops/pallas_stem.py); make_fast_stem is a no-op afterwards
            # (and handles the cfgs the Pallas stem doesn't match)
            from yolo_series_tpu.models.faststem import make_fast_stem
            from yolo_series_tpu.ops.pallas_stem import make_pallas_stem
            plan, params, state = make_pallas_stem(plan, params, state)
            plan, params, state = make_fast_stem(plan, params, state, max_pairs=2)
        if pallas_elan:
            # whole-ELAN-block Pallas kernels (ops/pallas_elan.py); falls
            # back to an identical-semantics XLA chain off-TPU
            from yolo_series_tpu.ops.pallas_elan import make_pallas_elan
            plan, params, state = make_pallas_elan(plan, params, state)
        if split_concat:
            # ELAN concat elimination: conv1x1(concat) -> per-tap sliced
            # matmuls (models/fastconcat.py; exact identity, plan-only).
            # Default OFF: measured NEGATIVE on yolov7@640 bs32 (900.3 ->
            # 798.3 img/s, tools/exp_split_concat.py) — XLA already folds
            # the aligned P5 concats; opt-in for P6/unaligned experiments.
            from yolo_series_tpu.models.fastconcat import make_split_concat
            plan = make_split_concat(plan)
        self.plan = plan
        self.batch_size = batch_size
        self.img_size = img_size
        self.max_det = max_det

        nms_fn = functools.partial(
            _single_image_nms, conf_thres=conf_thres, iou_thres=iou_thres,
            multi_label=False, agnostic=False, max_det=max_det,
            max_nms=max_nms, max_wh=4096.0, nc=plan.nc, tile=256,
            class_mask=None, score_dtype=jnp.bfloat16)

        from yolo_series_tpu.ops.nms import fused_head_nms
        head = plan.head
        hp_idx = len(plan.layers) - 1

        lb_fn = ratio = pad = None
        if ingest_hw is not None:
            from yolo_series_tpu.data.device_aug import make_device_letterbox
            lb_fn, ratio, pad = make_device_letterbox(
                tuple(ingest_hw), dst=img_size)
        self.ingest_hw = ingest_hw

        def end2end(params, state, x):
            # x: (B, H, W, 3) uint8 RGB; normalization fused on device;
            # fused head + top-k + decode-of-selected + NMS (no (B, A, no)
            # materialization — ops/nms.fused_head_nms, +19% e2e)
            if lb_fn is not None:
                x = lb_fn(x)  # raw frames -> letterboxed, on device
            xf = x.astype(dtype) / jnp.asarray(255.0, dtype)
            feats, _ = apply_model(plan, params, state, xf, training=False,
                                   dtype=dtype, return_head_inputs=True)
            num, boxes, scores, cls = fused_head_nms(
                head, params["layers"][hp_idx], feats,
                conf_thres=conf_thres, iou_thres=iou_thres, max_det=max_det,
                max_nms=max_nms, compute_dtype=dtype)
            if lb_fn is not None:
                # rescale detections back to source pixels (the host-side
                # scale_coords role, general.py)
                boxes = (boxes - jnp.asarray(
                    [pad[0], pad[1], pad[0], pad[1]], jnp.float32)
                ) / jnp.float32(ratio[0])
                hs, ws = ingest_hw
                boxes = jnp.clip(boxes, 0.0, jnp.asarray(
                    [ws, hs, ws, hs], jnp.float32))
            if pack_output:
                # one flat f32 row per image -> ONE device->host fetch per
                # batch (each separate fetch pays a full relay/grpc round
                # trip; 4 arrays = 4 RTTs). Unpack with `unpack()`.
                return jnp.concatenate(
                    [num[:, None].astype(jnp.float32), scores,
                     cls.astype(jnp.float32),
                     boxes.reshape(boxes.shape[0], -1)], axis=1)
            return {"num_dets": num[:, None], "det_boxes": boxes,
                    "det_scores": scores, "det_classes": cls}

        in_h, in_w = (ingest_hw if ingest_hw is not None
                      else (img_size, img_size))
        shape = jax.ShapeDtypeStruct((batch_size, in_h, in_w, 3), jnp.uint8)
        pshape = jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params)
        sshape = jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), state)
        self._exe = jax.jit(end2end).lower(pshape, sshape, shape).compile()
        self._params = params
        self._state = state
        self.pack_output = pack_output

    def unpack(self, packed: np.ndarray) -> Dict[str, np.ndarray]:
        """Inverse of the pack_output row layout."""
        md = self.max_det
        return {"num_dets": packed[:, :1].astype(np.int32),
                "det_scores": packed[:, 1:1 + md],
                "det_classes": packed[:, 1 + md:1 + 2 * md].astype(np.int32),
                "det_boxes": packed[:, 1 + 2 * md:].reshape(len(packed), md, 4)}

    def infer(self, images: np.ndarray) -> Dict[str, np.ndarray]:
        """images: (n<=B, H, W, 3) uint8 RGB, already letterboxed to
        img_size. Partial batches are padded and trimmed."""
        out, n = self.infer_async(images)
        if self.pack_output:
            return {k: v[:n] for k, v in self.unpack(np.asarray(out)).items()}
        return {k: np.asarray(v)[:n] for k, v in out.items()}

    def infer_async(self, images: np.ndarray):
        """Dispatch without materializing: returns ({name: device_array}, n).
        Lets a pipeline keep several batches in flight so device->host
        transfer latency (35 ms relay RTT on tunneled dev chips; PCIe/grpc
        hops in production) overlaps the next batch's compute."""
        n = images.shape[0]
        assert n <= self.batch_size
        if n < self.batch_size:
            pad = np.zeros((self.batch_size - n, *images.shape[1:]), images.dtype)
            images = np.concatenate([images, pad], 0)
        return self._exe(self._params, self._state, jnp.asarray(images)), n

    def warmup(self, iters=3):
        x = np.zeros((self.batch_size, self.img_size, self.img_size, 3), np.uint8)
        for _ in range(iters):
            self.infer(x)


class DynamicBatcher:
    """Queue-based micro-batching front end (Triton dynamic_batching
    equivalent). Call submit(image) from any thread; result is a Future-like
    handle.

    Pipelined like Triton's multiple in-flight executions: the batching
    thread DISPATCHES (infer_async) and a completion thread materializes
    results, so device->host latency (35 ms relay RTT on tunneled dev
    chips) overlaps the next batch's compute instead of serializing with
    it. `inflight` bounds queued executions (backpressure)."""

    def __init__(self, engine: ServingEngine, max_delay_ms: float = 5.0,
                 inflight: int = 3, stage_fn=None, completers: int = 2,
                 bs1_engine: Optional[ServingEngine] = None):
        """bs1_engine: optional compiled batch-1 engine for the LOW-LATENCY
        path — when a request arrives and the queue is otherwise empty, it
        dispatches immediately on this engine instead of waiting
        max_delay_ms for co-batching (Triton's preferred-batch-size
        behavior at low load; reference deploy README.md:115 publishes the
        16-client bs1 latency this path optimizes). At load the queue is
        non-empty and full-batch batching engages as before."""
        self.engine = engine
        self.bs1_engine = bs1_engine
        if bs1_engine is not None:
            assert bs1_engine.batch_size == 1
        self.max_delay = max_delay_ms / 1e3
        # stage_fn(frames) -> batch array; default host np.stack. Benchmarks
        # use it to substitute pre-staged device batches (tools/bench_serving
        # --prestaged: measures the serving stack minus the input link)
        self.stage_fn = stage_fn
        self.q: queue_mod.Queue = queue_mod.Queue()
        self._done: queue_mod.Queue = queue_mod.Queue(maxsize=max(inflight, 1))
        self._stop = False
        self.worker = threading.Thread(target=self._loop, daemon=True)
        # >1 completer overlaps device->host fetches of consecutive batches
        # (each fetch pays a full transport round trip; the relay/grpc link
        # multiplexes concurrent reads)
        self.completer_pool = [
            threading.Thread(target=self._complete, daemon=True)
            for _ in range(max(completers, 1))]
        self.worker.start()
        for t in self.completer_pool:
            t.start()

    def submit(self, image: np.ndarray):
        ev = threading.Event()
        slot = {"image": image, "event": ev, "result": None}
        self.q.put(slot)
        return slot

    @staticmethod
    def wait(slot, timeout=None):
        slot["event"].wait(timeout)
        return slot["result"]

    def _loop(self):
        bs = self.engine.batch_size
        while not self._stop:
            try:
                first = self.q.get(timeout=0.1)
            except queue_mod.Empty:
                continue
            batch = [first]
            eng = self.engine
            if (self.bs1_engine is not None and self.q.empty()
                    and self._done.qsize() == 0):
                # low-latency path: nothing queued AND nothing in flight —
                # dispatch NOW on the bs1 program, skip the co-batching wait.
                # The in-flight check keeps sustained sub-saturation load on
                # the co-batching path (Triton's preferred-batch-size
                # heuristic); without it every arrival that beats the queue
                # would serialize on the bs1 engine.
                eng = self.bs1_engine
            else:
                deadline = time.perf_counter() + self.max_delay
                while len(batch) < bs and time.perf_counter() < deadline:
                    try:
                        batch.append(self.q.get(timeout=max(
                            0.0, deadline - time.perf_counter())))
                    except queue_mod.Empty:
                        break
            frames = [b["image"] for b in batch]
            images = (self.stage_fn(frames) if self.stage_fn is not None
                      else np.stack(frames))
            out, _n = eng.infer_async(images)
            # blocks at `inflight` pending — but never past close(): a
            # plain put() could wedge forever once the completers exit
            while not self._stop:
                try:
                    self._done.put((batch, out, eng), timeout=0.1)
                    batch = None
                    break
                except queue_mod.Full:
                    continue
            if batch is not None:  # shut down mid-handoff: wake the waiters
                for b in batch:
                    b["event"].set()

    def _complete(self):
        while True:
            try:
                batch, out, eng = self._done.get(timeout=0.1)
            except queue_mod.Empty:
                if self._stop:
                    return  # drain everything dispatched before exiting
                continue
            if getattr(eng, "pack_output", False):
                host = eng.unpack(np.asarray(out))
            else:
                host = {k: np.asarray(v) for k, v in out.items()}
            for i, b in enumerate(batch):
                b["result"] = {k: v[i] for k, v in host.items()}
                b["event"].set()

    def close(self):
        """Stop the pipeline. In-flight batches still complete (completers
        drain _done before exiting); anything left undispatched is woken
        with result None so no wait() hangs forever."""
        self._stop = True
        self.worker.join(timeout=10)
        for t in self.completer_pool:
            t.join(timeout=10)
        while True:  # never-dispatched requests
            try:
                slot = self.q.get_nowait()
            except queue_mod.Empty:
                break
            slot["event"].set()
        while True:  # dispatched but stranded between queues
            try:
                batch, _, _ = self._done.get_nowait()
            except queue_mod.Empty:
                break
            for b in batch:
                b["event"].set()
