"""HTTP serving daemon: continuous batching over the exported artifacts.

The daemon's predictions must be the exported programs' own outputs —
requests batched together or padded to the fixed B change nothing
row-wise (convs are row-independent; the dispatch key is shared per
(scene, style, seed) group by construction).
"""

import json
import threading
import urllib.request

import jax
import numpy as np
import pytest

from mst_tpu import serve
from mst_tpu.serve_http import Batcher, run_server
from mst_tpu.train.trainer import Experiment

from tests.test_serve import B, H, OBS_LEN, W, make_params


@pytest.fixture(scope="module")
def deployment(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("serve_http")
    params = make_params(tmp, train_net="mosa_2",
                         position=["0", "1", "2", "3", "4"])
    base = Experiment(params)
    serve.export_model(base, tmp / "m", H, W, B, platforms=("cpu",))
    # a style delta (perturbed LoRA factors only)
    tuned = Experiment(make_params(tmp, train_net="mosa_2",
                                   position=["0", "1", "2", "3", "4"],
                                   seed=7))
    tuned.model_params = jax.tree.map(lambda x: x, base.model_params)
    mask = tuned._trainable_mask()
    tuned.model_params = jax.tree.map(
        lambda x, m: x + 0.05 if m else x, tuned.model_params, mask)
    delta_path = tmp / "style_biker.npz"
    tuned.save_params(str(delta_path))

    rng = np.random.default_rng(0)
    semantic = rng.normal(size=(1, H, W, 3)).astype(np.float32)
    np.save(tmp / "scene.npy", semantic)
    return tmp, semantic, str(delta_path)


def _request(port, path, payload=None, method=None):
    url = f"http://127.0.0.1:{port}{path}"
    data = json.dumps(payload).encode() if payload is not None else None
    req = urllib.request.Request(url, data=data, method=method)
    if data is not None:
        req.add_header("Content-Type", "application/json")
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture(scope="module")
def server(deployment):
    tmp, semantic, delta_path = deployment
    ready = threading.Event()
    t = threading.Thread(
        target=run_server,
        kwargs=dict(model_dir=str(tmp / "m"), port=0,
                    scenes=[f"death={tmp / 'scene.npy'}"],
                    max_wait_ms=200.0, ready_event=ready),
        daemon=True)
    t.start()
    assert ready.wait(timeout=120)
    port = ready.server.server_address[1]
    yield port, ready
    ready.server.shutdown()
    ready.batcher.stop()


def test_http_predict_matches_direct(server, deployment):
    tmp, semantic, delta_path = deployment
    port, _ = server

    code, health = _request(port, "/healthz")
    assert code == 200 and health["ok"] and health["batch_size"] == B
    assert health["scenes"] == ["death"]

    rng = np.random.default_rng(3)
    rows = rng.uniform(10, 50, size=(B, OBS_LEN, 2)).astype(np.float32)
    code, out = _request(port, "/predict", {
        "scene": "death", "observed": rows.tolist(), "seed": 11})
    assert code == 200, out
    got = np.asarray(out["trajectories"])

    direct = serve.load_model(tmp / "m").predict(
        semantic, rows, key=jax.random.PRNGKey(11))
    want = np.moveaxis(np.asarray(direct["trajectories"]), 1, 0)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # input validation surfaces as 400s, not dispatcher deaths
    assert _request(port, "/predict", {"scene": "nope",
                                       "observed": rows.tolist()})[0] == 400
    assert _request(port, "/predict", {"observed": [[0, 0]]})[0] == 400
    assert _request(port, "/predict", {"observed": rows.tolist(),
                                       "style": "ghost"})[0] == 400


def test_http_style_registration_and_scene_upload(server, deployment):
    tmp, semantic, delta_path = deployment
    port, _ = server

    code, out = _request(port, "/styles/biker", {"delta_path": delta_path})
    assert code == 200 and out["styles"] == ["biker"], out

    rng = np.random.default_rng(5)
    rows = rng.uniform(10, 50, size=(B, OBS_LEN, 2)).astype(np.float32)
    code, base_out = _request(port, "/predict", {
        "scene": "death", "observed": rows.tolist(), "seed": 2})
    code2, style_out = _request(port, "/predict", {
        "scene": "death", "observed": rows.tolist(), "seed": 2,
        "style": "biker"})
    assert code == 200 and code2 == 200
    assert not np.allclose(np.asarray(base_out["trajectories"]),
                           np.asarray(style_out["trajectories"]))

    # scene upload
    sem2 = rng.normal(size=(1, H, W, 3)).astype(np.float32)
    code, out = _request(port, "/scenes/upl", {"semantic": sem2.tolist()},
                         method="PUT")
    assert code == 200 and out["shape"] == [1, H, W, 3]
    code, out = _request(port, "/predict", {
        "scene": "upl", "observed": rows.tolist()})
    assert code == 200
    # bad shape rejected
    code, _ = _request(port, "/scenes/bad", {"semantic": [[0.0]]},
                       method="PUT")
    assert code == 400


def test_concurrent_clients_stress(server, deployment):
    """N client threads x M mixed-group requests: every response is 200
    (or an honest 503 under burst) and every 200 carries the right row
    count — no cross-request row leakage, no dispatcher deadlock."""
    tmp, semantic, delta_path = deployment
    port, _ = server
    n_threads, n_reqs = 8, 6
    rng = np.random.default_rng(17)
    errors, codes = [], []
    lock = threading.Lock()

    def client(tid):
        for r in range(n_reqs):
            n_rows = 1 + (tid + r) % 3
            rows = rng.uniform(10, 50, size=(n_rows, OBS_LEN, 2)).astype(
                np.float32)
            try:
                code, out = _request(port, "/predict", {
                    "scene": "death", "observed": rows.tolist(),
                    "seed": tid % 3})
            except Exception as ex:  # noqa: BLE001
                with lock:
                    errors.append(f"{tid}/{r}: {ex}")
                return
            with lock:
                codes.append(code)
                if code == 200:
                    if np.asarray(out["trajectories"]).shape[0] != n_rows:
                        errors.append(f"{tid}/{r}: row count mismatch")
                elif code != 503:
                    errors.append(f"{tid}/{r}: unexpected {code}: {out}")

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(n_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors, errors[:5]
    assert codes.count(200) >= n_threads * n_reqs * 0.8, (
        f"too many rejections: {codes.count(503)}/{len(codes)}")
    # the daemon is still healthy afterwards
    code, health = _request(port, "/healthz")
    assert code == 200 and health["ok"]
    assert health["queue_depth"] == 0


def test_overload_returns_503(deployment):
    """A bounded queue sheds load: with the dispatcher blocked and
    max_queue=2, further submits raise Overloaded (-> HTTP 503)."""
    from mst_tpu.serve_http import Batcher, Overloaded

    tmp, semantic, delta_path = deployment
    model = serve.load_model(tmp / "m")

    gate = threading.Event()
    real_predict = model.predict

    def slow_predict(*a, **k):
        gate.wait(timeout=60)
        return real_predict(*a, **k)

    model.predict = slow_predict
    batcher = Batcher(model, {"s": semantic}, max_wait_ms=1.0, max_queue=2)
    try:
        rng = np.random.default_rng(2)
        rows = rng.uniform(10, 50, size=(B, OBS_LEN, 2)).astype(np.float32)
        pend = [batcher.submit("s", None, i, rows) for i in range(2)]
        # the dispatcher holds one (blocked in predict); give it time to
        # drain the queue slot, then fill the remaining capacity
        import time as _time

        _time.sleep(0.3)
        for i in range(2, 8):
            try:
                pend.append(batcher.submit("s", None, i, rows))
            except Overloaded:
                break
        else:
            raise AssertionError("queue never filled -> no backpressure")
        gate.set()
        for p in pend:
            assert p.event.wait(timeout=120)
            assert p.error is None, p.error
    finally:
        gate.set()
        batcher.stop()


def test_max_queue_zero_means_unbounded(deployment):
    """max_queue<=0 disables admission bounding entirely (a queue.Queue
    maxsize of 0 is UNBOUNDED in Python; the admission check must agree,
    not reject everything)."""
    from mst_tpu.serve_http import Batcher

    tmp, semantic, delta_path = deployment
    model = serve.load_model(tmp / "m")
    batcher = Batcher(model, {"s": semantic}, max_wait_ms=1.0, max_queue=0)
    try:
        assert batcher.max_queue is None
        rows = np.zeros((1, OBS_LEN, 2), np.float32) + 20
        pend = [batcher.submit("s", None, i, rows) for i in range(4)]
        for p in pend:
            assert p.event.wait(timeout=120)
            assert p.error is None, p.error
    finally:
        batcher.stop()


def test_admission_bounds_total_unresolved(deployment):
    """max_queue bounds ALL admitted-but-unresolved requests — queued,
    dispatcher-backlogged, and in-flight alike. Deriving depth from
    qsize+backlog undercounts while the dispatcher holds popped items,
    letting admission overshoot by up to ~B; the explicit pending counter
    makes the 503 bound exact."""
    from mst_tpu.serve_http import Batcher, Overloaded

    tmp, semantic, delta_path = deployment
    model = serve.load_model(tmp / "m")
    gate = threading.Event()
    real_predict = model.predict
    model.predict = lambda *a, **k: (gate.wait(timeout=60),
                                     real_predict(*a, **k))[1]
    batcher = Batcher(model, {"s": semantic}, max_wait_ms=1.0, max_queue=3)
    try:
        import time as _time

        full = np.zeros((B, OBS_LEN, 2), np.float32) + 20
        rows = full[:1]
        # park the dispatcher inside a blocked dispatch (a full-B request
        # skips top-up entirely), then wait until it left the queue — the
        # in-flight request must STILL count against admission
        p0 = batcher.submit("s", None, 0, full)
        for _ in range(200):
            if batcher.q.qsize() == 0:
                break
            _time.sleep(0.01)
        assert batcher.q.qsize() == 0
        assert batcher.depth() == 1  # in-flight, not merely queued
        # two foreign-group requests (distinct seeds): the dispatcher will
        # park them in its backlog during top-up; they stay counted
        p1 = batcher.submit("s", None, 91, rows)
        p2 = batcher.submit("s", None, 92, rows)
        assert batcher.depth() == 3  # 1 in-flight + 2 queued/backlogged
        with pytest.raises(Overloaded):
            batcher.submit("s", None, 2, rows)
        gate.set()
        for p in [p0, p1, p2]:
            assert p.event.wait(timeout=120) and p.error is None
        # resolution releases admission slots: depth drains and a new
        # request is admitted again
        for _ in range(200):
            if batcher.depth() == 0:
                break
            _time.sleep(0.01)
        assert batcher.depth() == 0
        p3 = batcher.submit("s", None, 3, rows)
        assert p3.event.wait(timeout=120) and p3.error is None
    finally:
        gate.set()
        batcher.stop()


def test_style_lru_eviction(deployment):
    """max_styles caps resident overlays; least-recently-used goes."""
    tmp, semantic, delta_path = deployment
    model = serve.load_model(tmp / "m")
    model.max_styles = 2
    model.add_style("a", delta_path)
    model.add_style("b", delta_path)
    # touch 'a' so 'b' is the LRU when 'c' arrives
    rows = np.zeros((B, OBS_LEN, 2), np.float32) + 20
    model.predict(semantic, rows, style="a")
    evicted = model.add_style("c", delta_path)
    assert model.styles == ["a", "c"]
    assert evicted == ["b"]
    with pytest.raises(ValueError, match="unknown serving style"):
        model.predict(semantic, rows, style="b")


def test_max_styles_nonpositive_means_unbounded(deployment):
    """max_styles <= 0 disables the cap (the max_queue convention) —
    it must NOT mean 'evict everything incl. the style just added'."""
    tmp, semantic, delta_path = deployment
    model = serve.load_model(tmp / "m")
    model.max_styles = 0
    for name in ("a", "b", "c"):
        assert model.add_style(name, delta_path) == []
    assert model.styles == ["a", "b", "c"]


def test_scene_lru_eviction_over_http(deployment):
    """PUT /scenes is capped like styles: a scene-upload flood cannot grow
    host memory without bound; LRU (predict marks use) goes first."""
    tmp, semantic, delta_path = deployment
    ready = threading.Event()
    t = threading.Thread(
        target=run_server,
        kwargs=dict(model_dir=str(tmp / "m"), port=0,
                    scenes=[f"death={tmp / 'scene.npy'}"],
                    max_wait_ms=50.0, ready_event=ready, max_scenes=2),
        daemon=True)
    t.start()
    assert ready.wait(timeout=120)
    port = ready.server.server_address[1]
    try:
        code, health = _request(port, "/healthz")
        assert code == 200 and health["max_scenes"] == 2

        rng = np.random.default_rng(23)
        sem2 = rng.normal(size=(1, H, W, 3)).astype(np.float32)
        code, out = _request(port, "/scenes/s2", {"semantic": sem2.tolist()},
                             method="PUT")
        assert code == 200 and out["evicted"] == []

        # touch 'death' so 's2' is the LRU when 's3' arrives
        rows = rng.uniform(10, 50, size=(1, OBS_LEN, 2)).astype(np.float32)
        code, _ = _request(port, "/predict", {
            "scene": "death", "observed": rows.tolist()})
        assert code == 200
        code, out = _request(port, "/scenes/s3", {"semantic": sem2.tolist()},
                             method="PUT")
        assert code == 200 and out["evicted"] == ["s2"], out
        code, health = _request(port, "/healthz")
        assert sorted(health["scenes"]) == ["death", "s3"]
        # the evicted scene is now unknown (400, not a dispatcher death)
        code, out = _request(port, "/predict", {
            "scene": "s2", "observed": rows.tolist()})
        assert code == 400 and "unknown scene" in out["error"]
    finally:
        ready.server.shutdown()
        ready.batcher.stop()


def test_batcher_co_batches_and_pads(deployment):
    """Two 1-row submissions in one (scene, style, seed) group dispatch as
    ONE padded batch; each caller gets its own row, equal to the direct
    predict of the padded batch."""
    tmp, semantic, delta_path = deployment
    model = serve.load_model(tmp / "m")
    batcher = Batcher(model, {"s": semantic}, max_wait_ms=500.0)
    try:
        rng = np.random.default_rng(9)
        r1 = rng.uniform(10, 50, size=(1, OBS_LEN, 2)).astype(np.float32)
        r2 = rng.uniform(10, 50, size=(1, OBS_LEN, 2)).astype(np.float32)
        p1 = batcher.submit("s", None, 4, r1)
        p2 = batcher.submit("s", None, 4, r2)
        assert p1.event.wait(timeout=120) and p2.event.wait(timeout=120)
        assert p1.error is None and p2.error is None, (p1.error, p2.error)

        padded = np.concatenate([r1, r2] + [r1] * (B - 2))
        direct = model.predict(semantic, padded, key=jax.random.PRNGKey(4))
        want = np.moveaxis(np.asarray(direct["trajectories"]), 1, 0)
        np.testing.assert_allclose(p1.result["trajectories"], want[0:1],
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(p2.result["trajectories"], want[1:2],
                                   rtol=1e-5, atol=1e-5)
    finally:
        batcher.stop()
