"""Production inference serving: an HTTP server with dynamic batching.

The reference has no serving story beyond the eval loop; this provides
the deployment-side runtime: a threaded HTTP front end feeding a single
device worker through a dynamic batcher.  Requests are coalesced (up to
``batch_size``, waiting at most ``max_wait_ms`` for stragglers) and run
as ONE padded jitted forward — the pad keeps the compiled program's
shapes static so the device executes exactly one XLA program regardless
of the instantaneous request rate (the same pad+mask idea as the eval
loop's short-batch handling).

Model-agnostic: any ``model.apply`` works, including the compiled-LUT
(`--lut`), BN-folded (`--fold_bn`) and bf16 (`--bf16`) serving twins —
compose the flags as in eval mode.

Endpoints:
  GET  /healthz  -> {"model", "backend", "batch_size", "served"}
  POST /predict  -> body = JPEG/PNG bytes (Content-Type image/*) or a
                    raw float32 NHWC tensor (application/octet-stream,
                    shape from the model config); response JSON carries
                    top-5 class indices + probabilities and latency.
"""

from __future__ import annotations

import io
import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import jax
import jax.numpy as jnp


class DynamicBatcher:
    """Coalesce concurrent requests into one padded device call.

    The worker thread drains the queue: it takes the first pending
    request, waits up to ``max_wait_ms`` for more (up to ``batch_size``),
    pads the stack to exactly ``batch_size`` rows, and runs the jitted
    forward once.  Results are handed back through per-request events.
    """

    def __init__(self, forward, example_input: np.ndarray,
                 batch_size: int = 8, max_wait_ms: float = 2.0):
        self.batch_size = batch_size
        self.max_wait_s = max_wait_ms / 1e3
        self._forward = forward
        self._shape = tuple(example_input.shape)   # per-sample HWC
        self._q: queue.Queue = queue.Queue()
        self._stop = threading.Event()
        self._stats_lock = threading.Lock()
        self.reset_stats()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def submit(self, x: np.ndarray, timeout: float = 30.0) -> np.ndarray:
        if tuple(x.shape) != self._shape:
            raise ValueError(f"input shape {x.shape} != model input "
                             f"{self._shape}")
        done = threading.Event()
        slot = {}
        self._q.put((x, done, slot))
        if not done.wait(timeout):
            raise TimeoutError("inference timed out")
        if "error" in slot:
            raise RuntimeError(slot["error"])
        return slot["out"]

    _LAT_WINDOW = 512                   # recent-batch latency ring size

    def reset_stats(self):
        self.served = 0
        self.batches = 0                 # device programs run
        self._lat_ring = [0.0] * self._LAT_WINDOW
        self._lat_n = 0

    def stats(self) -> dict:
        """Serving health: throughput counters, batch fill (amortization
        the dynamic batcher achieved), recent device-batch latency."""
        with self._stats_lock:
            served, batches = self.served, self.batches
            lat = sorted(self._lat_ring[:min(self._lat_n,
                                             self._LAT_WINDOW)])
        return {
            "served": served,
            "batches": batches,
            "avg_batch_fill": round(served / batches, 2)
            if batches else 0.0,
            "batch_ms_p50": round(lat[len(lat) // 2], 2) if lat else None,
            "batch_ms_p95": round(lat[int(len(lat) * 0.95)], 2)
            if lat else None,
        }

    def close(self):
        self._stop.set()
        self._thread.join(timeout=5)
        # fail queued requests immediately instead of letting their
        # handler threads sit out the full submit timeout
        while True:
            try:
                _, done, slot = self._q.get_nowait()
            except queue.Empty:
                break
            slot["error"] = "server shutting down"
            done.set()

    def _worker(self):
        while not self._stop.is_set():
            try:
                first = self._q.get(timeout=0.1)
            except queue.Empty:
                continue
            batch = [first]
            deadline = time.monotonic() + self.max_wait_s
            while len(batch) < self.batch_size:
                left = deadline - time.monotonic()
                if left <= 0:
                    break
                try:
                    batch.append(self._q.get(timeout=left))
                except queue.Empty:
                    break
            xs = np.stack([b[0] for b in batch])
            n = xs.shape[0]
            if n < self.batch_size:      # static shapes: pad, run, slice
                pad = np.zeros((self.batch_size - n,) + self._shape,
                               xs.dtype)
                xs = np.concatenate([xs, pad])
            try:
                t0 = time.perf_counter()
                out = np.asarray(self._forward(jnp.asarray(xs)))[:n]
                ms = (time.perf_counter() - t0) * 1e3
                # stats before done.set(): a caller may read/reset the
                # counters the moment its event fires
                with self._stats_lock:
                    self.served += n
                    self.batches += 1
                    self._lat_ring[self._lat_n % self._LAT_WINDOW] = ms
                    self._lat_n += 1
                for i, (_, done, slot) in enumerate(batch):
                    slot["out"] = out[i]
                    done.set()
            except Exception as e:      # propagate, don't hang clients
                for _, done, slot in batch:
                    slot["error"] = repr(e)
                    done.set()


def make_forward(model, params, state, mesh=None, spatial=False):
    """One jitted forward closed over nothing big: params/state enter as
    arguments (LUT pytrees would otherwise inline gigabytes of tables
    into the program — see compile/lut_eval.py's design note).

    ``mesh``: shard the padded batch over the host's local devices —
    batch over 'data' and, with ``spatial``, image height over 'model'
    (GSPMD halo exchanges); params/state replicate.  Out-sharding
    replicates the probs so the host read is one transfer."""
    def fwd_fn(params, state, x):
        logits, _ = model.apply(params, state, x, training=False)
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

    if mesh is None:
        fwd = jax.jit(fwd_fn)
    else:
        from ..parallel.sharding import batch_sharding, replicate, \
            spatial_sharding

        img = spatial_sharding(mesh) if spatial else batch_sharding(mesh)
        fwd = jax.jit(fwd_fn, in_shardings=(None, None, img),
                      out_shardings=replicate(mesh))

    return lambda x: fwd(params, state, x)


def _decode_image(body: bytes, transform) -> np.ndarray:
    from PIL import Image

    return transform(Image.open(io.BytesIO(body)))


def serve(model, params, state, transform, input_shape, *,
          host: str = "127.0.0.1", port: int = 8000, batch_size: int = 8,
          max_wait_ms: float = 2.0, mesh=None, spatial=False,
          ready_event=None, stop_event=None, verbose: bool = True):
    """Run the HTTP server until ``stop_event`` is set (or forever).

    ``transform``: host preprocessing for image uploads (the same
    PIL-exact eval transform the eval loop uses).  ``input_shape``: the
    per-sample HWC shape raw-tensor posts must match.  ``mesh``/
    ``spatial``: shard the padded batch over the host's local devices
    (see ``make_forward``).  ``ready_event`` is set once the socket is
    bound (tests).  Returns the bound port.
    """
    forward = make_forward(model, params, state, mesh=mesh,
                           spatial=spatial)
    example = np.zeros(input_shape, np.float32)
    batcher = DynamicBatcher(forward, example, batch_size=batch_size,
                             max_wait_ms=max_wait_ms)
    # compile once at startup so the first request doesn't pay it (the
    # generous timeout covers a first TPU compile over a slow link);
    # drop the warmup from the stats — its latency is the compile
    batcher.submit(example, timeout=600.0)
    batcher.reset_stats()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):   # route through our verbosity
            if verbose:
                print("serve:", fmt % args)

        def _json(self, code: int, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path != "/healthz":
                return self._json(404, {"error": "unknown path"})
            self._json(200, {
                "model": model.name,
                "backend": jax.default_backend(),
                "batch_size": batch_size,
                **batcher.stats(),
            })

        def do_POST(self):
            if self.path != "/predict":
                return self._json(404, {"error": "unknown path"})
            try:
                length = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(length)
                ctype = self.headers.get("Content-Type",
                                         "application/octet-stream")
                if ctype.startswith("image/"):
                    x = _decode_image(body, transform)
                else:
                    x = np.frombuffer(body, np.float32).reshape(input_shape)
                t0 = time.perf_counter()
                probs = batcher.submit(np.ascontiguousarray(x, np.float32))
                ms = (time.perf_counter() - t0) * 1e3
                top5 = np.argsort(probs)[::-1][:5]
                self._json(200, {
                    "top5": [int(i) for i in top5],
                    "probs": [float(probs[i]) for i in top5],
                    "latency_ms": round(ms, 2),
                })
            except Exception as e:
                self._json(400, {"error": repr(e)})

    httpd = ThreadingHTTPServer((host, port), Handler)
    bound_port = httpd.server_address[1]
    if verbose:
        print(f"serving {model.name} on http://{host}:{bound_port} "
              f"(batch {batch_size}, wait {max_wait_ms} ms)")
    if ready_event is not None:
        ready_event.port = bound_port
        ready_event.set()
    try:
        if stop_event is None:
            httpd.serve_forever(poll_interval=0.2)
        else:
            httpd_thread = threading.Thread(target=httpd.serve_forever,
                                            kwargs={"poll_interval": 0.2},
                                            daemon=True)
            httpd_thread.start()
            stop_event.wait()
    finally:
        httpd.shutdown()
        batcher.close()
    return bound_port
