"""Load-bench the HTTP inference server (runtime/server.py).

Spins the server in-process over a registry model, fires concurrent
raw-tensor clients, and reports request throughput + latency quantiles.
The dynamic batcher's value shows up as the gap between per-request
latency and 1/throughput: concurrent requests coalesce into one padded
device program.

    python tools/bench_http.py [--model NAME] [--lut] [--clients 16]
                               [--requests 200] [--serve_batch 8]
                               [--platform cpu|'']

Writes results/http_bench.json.  On the real TPU the tunnel's H2D
bandwidth (~3-32 MB/s; a 224^2 f32 image is 602 KB) bounds end-to-end
numbers — the measurement is of the DEPLOYMENT path, not the chip.
"""

import argparse
import json
import os
import sys
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="ttnet_imagenet_xsmall")
    ap.add_argument("--nfilter", type=int, default=4)
    ap.add_argument("--tfilter", type=int, default=4)
    ap.add_argument("--layers", type=int, default=0)
    ap.add_argument("--lut", action="store_true")
    ap.add_argument("--gates", choices=["dnf", "cnf"], default=None,
                    help="serve the boolean circuit (device bit-sliced "
                         "runtime)")
    ap.add_argument("--clients", type=int, default=16)
    ap.add_argument("--requests", type=int, default=200)
    ap.add_argument("--serve_batch", type=int, default=8)
    ap.add_argument("--serve_wait_ms", type=float, default=2.0)
    ap.add_argument("--platform", default="cpu",
                    help="'' = default backend (TPU when tunneled)")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from scale_imagenet_tpu.main import main as cli_main

    ready = threading.Event()
    stop = threading.Event()
    argv = ["--mode", "serve", "--model", args.model,
            "--nfilter", str(args.nfilter), "--tfilter", str(args.tfilter),
            "--layers", str(args.layers), "--port", "0",
            "--serve_batch", str(args.serve_batch),
            "--serve_wait_ms", str(args.serve_wait_ms),
            "--root_dir", "/tmp/http_bench"]
    if args.lut:
        argv += ["--lut"]
    if args.gates:
        argv += ["--gates", args.gates]
    t = threading.Thread(target=cli_main, args=(argv,),
                         kwargs=dict(serve_ready=ready, serve_stop=stop),
                         daemon=True)
    t.start()
    if not ready.wait(900):
        raise RuntimeError("server failed to start")
    port = ready.port

    from scale_imagenet_tpu.models import get_model

    size = getattr(get_model(args.model, nfilter=args.nfilter,
                             tfilter=args.tfilter,
                             layers=args.layers).config, "image_size", 224)
    rng = np.random.default_rng(0)
    body = rng.standard_normal((size, size, 3)).astype(np.float32).tobytes()

    lat, lock = [], threading.Lock()
    clients = min(args.clients, args.requests)
    per_client = -(-args.requests // clients)      # ceil: run them all

    def client():
        mine = []
        for _ in range(per_client):
            t0 = time.perf_counter()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/predict", data=body,
                headers={"Content-Type": "application/octet-stream"})
            with urllib.request.urlopen(req, timeout=300) as r:
                json.loads(r.read())
            mine.append(time.perf_counter() - t0)
        with lock:
            lat.extend(mine)

    # warmup burst (first padded program already compiled by serve())
    client_threads = [threading.Thread(target=client)
                      for _ in range(clients)]
    wall0 = time.perf_counter()
    for c in client_threads:
        c.start()
    for c in client_threads:
        c.join()
    wall = time.perf_counter() - wall0
    stop.set()
    t.join(timeout=30)

    lat_ms = np.sort(np.asarray(lat)) * 1e3
    n = len(lat_ms)
    # name the backend that actually ran, not the request ("default"
    # said nothing about whether the chip or the CPU served)
    backend = jax.default_backend()
    res = {
        "model": args.model + ("+lut" if args.lut else "")
        + (f"+gates_{args.gates}" if args.gates else ""),
        "platform": backend,
        "clients": clients, "requests": n,
        "serve_batch": args.serve_batch,
        "req_per_s": round(n / wall, 2),
        "p50_ms": round(float(lat_ms[n // 2]), 2),
        "p95_ms": round(float(lat_ms[int(n * 0.95)]), 2),
        "p99_ms": round(float(lat_ms[min(n - 1, int(n * 0.99))]), 2),
    }
    print(json.dumps(res))
    os.makedirs("results", exist_ok=True)
    out = {}
    if os.path.exists("results/http_bench.json"):
        with open("results/http_bench.json") as f:
            out = json.load(f)
    out[f"{res['model']}@{res['platform']}"
        f"/c{clients}b{args.serve_batch}"] = res
    with open("results/http_bench.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
