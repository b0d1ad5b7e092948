"""--mode serve: HTTP inference server with dynamic batching
(runtime/server.py).  The reference stops at the eval loop; serving is
the deployment-side runtime the compiled networks exist for, so it gets
the same correctness treatment: batcher semantics, HTTP surface, parity
of served probabilities with a direct forward, and CLI flag honesty.
"""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scale_imagenet_tpu.models import get_model
from scale_imagenet_tpu.runtime.server import DynamicBatcher, make_forward, \
    serve


# ---------------------------------------------------------------- batcher

def test_batcher_coalesces_pads_and_orders():
    """Concurrent submits ride ONE padded forward call; each caller gets
    its own row back."""
    calls = []

    def forward(x):
        x = np.asarray(x)
        calls.append(x.shape)
        return x[:, 0, 0, 0:1] * 2.0          # per-row marker

    b = DynamicBatcher(forward, np.zeros((2, 2, 1), np.float32),
                       batch_size=4, max_wait_ms=200.0)
    try:
        outs = [None] * 3

        def post(i):
            x = np.full((2, 2, 1), float(i + 1), np.float32)
            outs[i] = b.submit(x)

        ts = [threading.Thread(target=post, args=(i,)) for i in range(3)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        # all three coalesced into one padded batch of exactly batch_size
        assert calls == [(4, 2, 2, 1)]
        for i in range(3):
            assert outs[i].shape == (1,) and outs[i][0] == 2.0 * (i + 1)
        assert b.served == 3
    finally:
        b.close()


def test_batcher_shape_and_error_propagation():
    def forward(x):
        raise RuntimeError("device fell over")

    b = DynamicBatcher(forward, np.zeros((2,), np.float32), batch_size=2,
                       max_wait_ms=1.0)
    try:
        with pytest.raises(ValueError, match="input shape"):
            b.submit(np.zeros((3,), np.float32))
        with pytest.raises(RuntimeError, match="device fell over"):
            b.submit(np.zeros((2,), np.float32))
    finally:
        b.close()


# ------------------------------------------------------------------ HTTP

@pytest.fixture(scope="module")
def tiny_server():
    """A live server on an ephemeral port over a tiny flagship-family
    model; yields (port, model, params, state)."""
    model = get_model("ttnet_imagenet_xsmall", nfilter=4, tfilter=4,
                      layers=0)
    params, state = model.init(jax.random.PRNGKey(0))
    from scale_imagenet_tpu.data import imagenet_eval_transform

    ready = threading.Event()
    stop = threading.Event()
    t = threading.Thread(
        target=serve,
        args=(model, params, state, imagenet_eval_transform,
              (224, 224, 3)),
        kwargs=dict(port=0, batch_size=4, max_wait_ms=1.0,
                    ready_event=ready, stop_event=stop, verbose=False),
        daemon=True)
    t.start()
    assert ready.wait(180), "server failed to start"
    yield ready.port, model, params, state
    stop.set()
    t.join(timeout=30)


def _post(port, body, ctype):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/predict", data=body,
        headers={"Content-Type": ctype}, method="POST")
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def test_http_predict_matches_direct_forward(tiny_server):
    port, model, params, state = tiny_server
    rng = np.random.default_rng(0)
    x = rng.standard_normal((224, 224, 3)).astype(np.float32)

    out = _post(port, x.tobytes(), "application/octet-stream")
    assert len(out["top5"]) == 5 and len(out["probs"]) == 5
    assert out["latency_ms"] > 0

    logits, _ = model.apply(params, state, jnp.asarray(x)[None],
                            training=False)
    probs = jax.nn.softmax(logits[0].astype(jnp.float32))
    want = np.argsort(np.asarray(probs))[::-1][:5]
    assert out["top5"] == [int(i) for i in want]
    np.testing.assert_allclose(out["probs"],
                               np.asarray(probs)[want], rtol=1e-4)


def test_http_image_upload(tiny_server):
    """JPEG body goes through the PIL-exact eval transform."""
    PIL = pytest.importorskip("PIL")
    import io

    from PIL import Image
    from scale_imagenet_tpu.data import imagenet_eval_transform

    port, model, params, state = tiny_server
    rng = np.random.default_rng(1)
    img = Image.fromarray(
        rng.integers(0, 255, (280, 260, 3), dtype=np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="JPEG")
    out = _post(port, buf.getvalue(), "image/jpeg")

    x = imagenet_eval_transform(Image.open(io.BytesIO(buf.getvalue())))
    logits, _ = model.apply(params, state, jnp.asarray(x)[None],
                            training=False)
    want = int(jnp.argmax(logits[0]))
    assert out["top5"][0] == want


def test_http_health_and_errors(tiny_server):
    port, model, *_ = tiny_server
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
        h = json.loads(r.read())
    assert h["model"] == model.name and h["served"] >= 1
    assert h["batches"] >= 1 and h["avg_batch_fill"] >= 1.0
    assert h["batch_ms_p50"] is None or h["batch_ms_p50"] > 0

    # malformed body -> 400 JSON error, not a hung connection
    try:
        _post(port, b"notanimage", "application/octet-stream")
        assert False, "expected HTTP 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert "error" in json.loads(e.read())

    # unknown path -> 404
    try:
        urllib.request.urlopen(f"http://127.0.0.1:{port}/nope", timeout=30)
        assert False, "expected HTTP 404"
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_concurrent_requests_one_program(tiny_server):
    """A burst of concurrent posts is answered correctly for every
    caller (dynamic batching must not cross-wire responses)."""
    port, model, params, state = tiny_server
    rng = np.random.default_rng(2)
    xs = rng.standard_normal((6, 224, 224, 3)).astype(np.float32)
    logits, _ = model.apply(params, state, jnp.asarray(xs),
                            training=False)
    want = [int(i) for i in jnp.argmax(logits, -1)]

    got = [None] * 6

    def post(i):
        got[i] = _post(port, xs[i].tobytes(),
                       "application/octet-stream")["top5"][0]

    ts = [threading.Thread(target=post, args=(i,)) for i in range(6)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert got == want


# ------------------------------------------------------------------- CLI

def test_cli_serve_lut_composition(tmp_path):
    """--mode serve --lut end-to-end through the CLI: the compiled
    truth-table twin serves HTTP requests bit-identically to the conv
    forward (FHE family — the reference's compiled-deployment story,
    TT_FHE_SMALL.py:322-431, behind a production front end)."""
    from scale_imagenet_tpu.main import main

    ready = threading.Event()
    stop = threading.Event()
    t = threading.Thread(
        target=main,
        args=(["--mode", "serve", "--model", "TT_FHE_SMALL",
               "--nfilter", "4", "--tfilter", "4",
               "--lut", "--lut_path", str(tmp_path / "luts.npz"),
               "--port", "0", "--serve_batch", "2", "--serve_wait_ms",
               "1", "--root_dir", str(tmp_path)],),
        kwargs=dict(serve_ready=ready, serve_stop=stop), daemon=True)
    t.start()
    try:
        assert ready.wait(300), "LUT server failed to start"
        port = ready.port

        model = get_model("TT_FHE_SMALL", nfilter=4, tfilter=4)
        params, state = model.init(jax.random.PRNGKey(0))  # --seed 0
        rng = np.random.default_rng(3)
        x = rng.standard_normal((32, 32, 3)).astype(np.float32)
        out = _post(port, x.tobytes(), "application/octet-stream")

        logits, _ = model.apply(params, state, jnp.asarray(x)[None],
                                training=False)
        assert out["top5"][0] == int(jnp.argmax(logits[0]))
        # the archive was written and is reloadable for the next server
        assert (tmp_path / "luts.npz").exists()
    finally:
        stop.set()
        t.join(timeout=60)


def test_cli_serve_mesh_sharded(tmp_path):
    """--mode serve over the host's local device mesh: the padded batch
    shards dp ('data') + sp (height over 'model', GSPMD halos) and the
    answers equal the unsharded forward; --lut refuses an explicit
    multi-device mesh."""
    from scale_imagenet_tpu.main import main

    ready = threading.Event()
    stop = threading.Event()
    t = threading.Thread(
        target=main,
        args=(["--mode", "serve", "--nfilter", "4", "--tfilter", "4",
               "--layers", "0", "--port", "0", "--serve_batch", "4",
               "--serve_wait_ms", "1", "--mesh_data", "2",
               "--mesh_model", "4", "--sp",
               "--root_dir", str(tmp_path)],),
        kwargs=dict(serve_ready=ready, serve_stop=stop), daemon=True)
    t.start()
    try:
        assert ready.wait(300), "sharded server failed to start"
        port = ready.port

        model = get_model("ttnet_imagenet_small", nfilter=4, tfilter=4,
                          layers=0)
        params, state = model.init(jax.random.PRNGKey(0))  # --seed 0
        rng = np.random.default_rng(7)
        x = rng.standard_normal((224, 224, 3)).astype(np.float32)
        out = _post(port, x.tobytes(), "application/octet-stream")
        logits, _ = model.apply(params, state, jnp.asarray(x)[None],
                                training=False)
        assert out["top5"][0] == int(jnp.argmax(logits[0]))
    finally:
        stop.set()
        t.join(timeout=60)

def test_cli_serve_lut_mesh_dp(tmp_path):
    """--mode serve --lut --mesh_data 2: data-parallel COMPILED serving —
    the padded batch shards over 'data' via shard_map (GSPMD cannot
    partition the Pallas gather; each device walks its batch slice with
    replicated tables) and answers equal the unsharded forward."""
    from scale_imagenet_tpu.main import main

    ready = threading.Event()
    stop = threading.Event()
    t = threading.Thread(
        target=main,
        args=(["--mode", "serve", "--model", "TT_FHE_SMALL",
               "--nfilter", "4", "--tfilter", "4",
               "--lut", "--lut_path", str(tmp_path / "luts.npz"),
               "--mesh_data", "2", "--port", "0", "--serve_batch", "4",
               "--serve_wait_ms", "1", "--root_dir", str(tmp_path)],),
        kwargs=dict(serve_ready=ready, serve_stop=stop), daemon=True)
    t.start()
    try:
        assert ready.wait(300), "dp LUT server failed to start"
        port = ready.port

        model = get_model("TT_FHE_SMALL", nfilter=4, tfilter=4)
        params, state = model.init(jax.random.PRNGKey(0))  # --seed 0
        rng = np.random.default_rng(13)
        x = rng.standard_normal((32, 32, 3)).astype(np.float32)
        out = _post(port, x.tobytes(), "application/octet-stream")
        logits, _ = model.apply(params, state, jnp.asarray(x)[None],
                                training=False)
        assert out["top5"][0] == int(jnp.argmax(logits[0]))
    finally:
        stop.set()
        t.join(timeout=60)


def test_cli_serve_flag_honesty(tmp_path):
    """--mode serve rejects the flags that cannot apply (the no-flag-
    silently-does-nothing rule, cf. reference main.py:29-79)."""
    from scale_imagenet_tpu.main import main

    base = ["--mode", "serve", "--nfilter", "4", "--tfilter", "4",
            "--layers", "0", "--root_dir", str(tmp_path)]
    for extra, msg in [(["--tp"], "--tp"),
                       (["--amp"], "--amp"),
                       (["--certify", "0.03"], "--certify"),
                       (["--attack", "fgsm"], "--attack"),
                       (["--shards_dir", "/tmp/x"], "--shards_dir"),
                       (["--native_data"], "--native_data"),
                       (["--gates", "dnf", "--lut"], "pick one"),
                       (["--gates", "dnf", "--bf16"], "--bf16"),
                       (["--gates", "dnf", "--fold_bn"], "--fold_bn"),
                       (["--lut", "--sp", "--mesh_model", "2"],
                        "--sp"),
                       (["--lut", "--mesh_data", "3",
                         "--serve_batch", "4"], "not divisible")]:
        with pytest.raises(ValueError, match=msg):
            main(base + extra)


def test_cli_serve_gates_composition(tmp_path):
    """--mode serve --gates dnf: the compiled boolean CIRCUIT serves
    HTTP requests through the DEVICE runtime (bit-sliced int32 cube
    evaluation), answers identical to the conv forward; the host-only
    fallback (budget exceeded) is a clear startup error instead of a
    silently unjittable server."""
    from scale_imagenet_tpu.config import performance
    from scale_imagenet_tpu.main import main

    ready = threading.Event()
    stop = threading.Event()
    args = ["--mode", "serve", "--model", "TT_FHE_SMALL",
            "--nfilter", "4", "--tfilter", "4", "--gates", "dnf",
            "--port", "0", "--serve_batch", "2", "--serve_wait_ms", "1",
            "--root_dir", str(tmp_path)]
    t = threading.Thread(target=main, args=(args,),
                         kwargs=dict(serve_ready=ready, serve_stop=stop),
                         daemon=True)
    t.start()
    try:
        assert ready.wait(300), "gate server failed to start"
        port = ready.port

        model = get_model("TT_FHE_SMALL", nfilter=4, tfilter=4)
        params, state = model.init(jax.random.PRNGKey(0))  # --seed 0
        rng = np.random.default_rng(11)
        x = rng.standard_normal((32, 32, 3)).astype(np.float32)
        out = _post(port, x.tobytes(), "application/octet-stream")
        logits, _ = model.apply(params, state, jnp.asarray(x)[None],
                                training=False)
        assert out["top5"][0] == int(jnp.argmax(logits[0]))
    finally:
        stop.set()
        t.join(timeout=60)

    saved = performance.gates_device_budget
    performance.gates_device_budget = 1   # force the host path
    try:
        with pytest.raises(ValueError, match="gates_device_budget"):
            main(args)
    finally:
        performance.gates_device_budget = saved
