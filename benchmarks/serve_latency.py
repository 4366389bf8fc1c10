"""Serving latency/throughput harness for the HTTP daemon (serve_http).

Closed-loop load generator: N client threads fire /predict requests at a
running daemon (or one this harness starts in-process from --model_dir)
and report per-request latency percentiles, sustained request rate, and
the 503 shed rate — the numbers docs/serving.md quotes.

Usage (against a live daemon):
  python -m benchmarks.serve_latency --url http://127.0.0.1:8000 \
      --threads 8 --requests 50 --rows 2

Self-hosted (exports nothing; --model_dir must already exist):
  python -m benchmarks.serve_latency --model_dir /path/m \
      --scene_npy scene.npy --threads 8 --requests 50

Prints ONE JSON line:
  {"p50_ms": ..., "p95_ms": ..., "p99_ms": ..., "rps": ...,
   "ok": N, "shed": N, "errors": N, "threads": T, "rows": R}
"""

import argparse
import json
import threading
import time
import urllib.error
import urllib.request

import numpy as np


def _predict(url, payload, timeout=300):
    data = json.dumps(payload).encode()
    req = urllib.request.Request(f"{url}/predict", data=data)
    req.add_header("Content-Type", "application/json")
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return r.status
    except urllib.error.HTTPError as e:
        e.read()
        return e.code


def run_load(url, threads=8, requests=50, rows=2, obs_len=None, seed=0):
    with urllib.request.urlopen(f"{url}/healthz", timeout=60) as r:
        health = json.loads(r.read())
    obs_len = obs_len or health["obs_len"]
    if not health["scenes"]:
        raise SystemExit(
            "daemon has no resident scenes — start it with --scene "
            "name=semantic.npy or upload one via PUT /scenes/<name> first")
    scene = sorted(health["scenes"])[0]
    rng = np.random.default_rng(seed)

    lat, codes = [], []
    lock = threading.Lock()

    def client(tid):
        # per-thread Generator: np Generators are not thread-safe, and a
        # shared one racing across clients corrupts the draw stream
        trng = np.random.default_rng((seed, tid))
        for i in range(requests):
            payload = {
                "scene": scene,
                "observed": trng.uniform(
                    10, 50, size=(rows, obs_len, 2)).tolist(),
                "seed": tid % 4,
            }
            t0 = time.perf_counter()
            try:
                code = _predict(url, payload)
            except Exception:  # noqa: BLE001 — timeout/reset under load
                code = -1  # counted in 'errors'; the thread keeps going
            dt = time.perf_counter() - t0
            with lock:
                lat.append(dt)
                codes.append(code)

    # one warmup request compiles/stages everything
    _predict(url, {"scene": scene,
                   "observed": rng.uniform(
                       10, 50, size=(rows, obs_len, 2)).tolist()})
    ts = [threading.Thread(target=client, args=(i,)) for i in range(threads)]
    t_all = time.perf_counter()
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    wall = time.perf_counter() - t_all

    lat_ok = [l for l, c in zip(lat, codes) if c == 200]
    q = (lambda p: float(np.percentile(lat_ok, p) * 1e3)) if lat_ok else \
        (lambda p: float("nan"))
    return {
        "p50_ms": round(q(50), 2), "p95_ms": round(q(95), 2),
        "p99_ms": round(q(99), 2),
        "rps": round(codes.count(200) / wall, 2),
        "ok": codes.count(200), "shed": codes.count(503),
        "errors": len([c for c in codes if c not in (200, 503)]),
        "threads": threads, "rows": rows,
        "batch_size": health["batch_size"],
        "max_queue": health.get("max_queue"),
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--url", default=None,
                        help="base URL of a running daemon")
    parser.add_argument("--model_dir", default=None,
                        help="self-host this exported model instead")
    parser.add_argument("--scene_npy", default=None,
                        help="scene map for self-hosting")
    parser.add_argument("--threads", type=int, default=8)
    parser.add_argument("--requests", type=int, default=50)
    parser.add_argument("--rows", type=int, default=2)
    parser.add_argument("--max_wait_ms", type=float, default=5.0)
    parser.add_argument("--max_queue", type=int, default=64)
    args = parser.parse_args()

    server = None
    url = args.url
    if url is None:
        if not (args.model_dir and args.scene_npy):
            parser.error("--url or (--model_dir + --scene_npy) required")
        from mst_tpu.serve_http import run_server

        ready = threading.Event()
        threading.Thread(
            target=run_server,
            kwargs=dict(model_dir=args.model_dir, port=0,
                        scenes=[f"scene={args.scene_npy}"],
                        max_wait_ms=args.max_wait_ms,
                        max_queue=args.max_queue, ready_event=ready),
            daemon=True).start()
        assert ready.wait(timeout=300)
        server = ready
        url = f"http://127.0.0.1:{ready.server.server_address[1]}"

    try:
        print(json.dumps(run_load(url, args.threads, args.requests,
                                  args.rows)))
    finally:
        if server is not None:
            server.server.shutdown()
            server.batcher.stop()


if __name__ == "__main__":
    main()
