"""HTTP serving daemon: payload decoding, the dynamic batcher, and the
end-to-end server against a live Predictor (serve.py). The reference has
no serving path at all (its closest artifact is main_toy.py:39-54's
in-process evaluation loop)."""

import io
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

import jax.numpy as jnp

from duoformer_tcga_tpu.inference import Predictor
from duoformer_tcga_tpu.models.duoformer import DuoFormer
from duoformer_tcga_tpu.serve import (DynamicBatcher, ServeError,
                                      decode_payload, make_server)


# -- decode_payload ---------------------------------------------------------

def _png_bytes(img):
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    return buf.getvalue()


def _npy_bytes(arr):
    buf = io.BytesIO()
    np.save(buf, arr)
    return buf.getvalue()


def test_decode_payload_png_roundtrip():
    img = np.random.default_rng(0).integers(0, 256, (224, 224, 3), np.uint8)
    out = decode_payload(_png_bytes(img), 224)
    assert out.shape == (1, 224, 224, 3)
    np.testing.assert_array_equal(out[0], img)   # PNG is lossless


def test_decode_payload_image_resizes():
    img = np.random.default_rng(1).integers(0, 256, (100, 60, 3), np.uint8)
    out = decode_payload(_png_bytes(img), 32)
    assert out.shape == (1, 32, 32, 3)


def test_decode_payload_npy_single_and_batch():
    rng = np.random.default_rng(2)
    one = rng.integers(0, 256, (16, 16, 3), np.uint8)
    np.testing.assert_array_equal(decode_payload(_npy_bytes(one), 16)[0], one)
    batch = rng.integers(0, 256, (5, 16, 16, 3), np.uint8)
    out = decode_payload(_npy_bytes(batch), 16)
    np.testing.assert_array_equal(out, batch)
    # off-size npy tiles are resized like folder decoding
    assert decode_payload(_npy_bytes(batch), 8).shape == (5, 8, 8, 3)
    # grayscale promotes to 3 channels
    gray = rng.integers(0, 256, (16, 16), np.uint8)
    assert decode_payload(_npy_bytes(gray), 16).shape == (1, 16, 16, 3)


def test_decode_payload_grayscale_batch_and_dtypes():
    rng = np.random.default_rng(8)
    # [N, H, W] grayscale batch: N tiles, not one [1, N, H, 3] image
    gray_batch = rng.integers(0, 256, (5, 16, 16), np.uint8)
    out = decode_payload(_npy_bytes(gray_batch), 16)
    assert out.shape == (5, 16, 16, 3)
    np.testing.assert_array_equal(out[..., 0], gray_batch)
    # float in [0,1] scales x255 instead of truncating to black
    f = rng.random((2, 16, 16, 3), np.float32)
    out = decode_payload(_npy_bytes(f), 16)
    np.testing.assert_array_equal(out, (f * 255.0).astype(np.uint8))
    assert out.max() > 1
    # float already in [0,255] and wide ints clip, not wrap
    f255 = np.full((16, 16, 3), 300.0, np.float32)
    assert decode_payload(_npy_bytes(f255), 16).max() == 255
    u16 = np.full((16, 16, 3), 4096, np.uint16)
    assert decode_payload(_npy_bytes(u16), 16).min() == 255
    # zero tiles is a client error, not an IndexError-500
    with pytest.raises(ServeError):
        decode_payload(_npy_bytes(np.zeros((0, 16, 16, 3), np.uint8)), 16)


def test_batcher_overload_is_retryable():
    from duoformer_tcga_tpu.serve import OverloadError

    gate = threading.Event()

    def fn(batch):
        gate.wait(5)
        return batch.sum(axis=(1, 2, 3))[:, None]

    b = DynamicBatcher(fn, batch_size=1, max_wait_ms=0, max_queue=2)
    try:
        t = threading.Thread(
            target=lambda: b.submit(np.ones((2, 2, 3), np.uint8)))
        t.start()
        with pytest.raises(OverloadError):   # 3 > max_queue while blocked
            b.submit_many(np.ones((3, 2, 2, 3), np.uint8))
        assert isinstance(OverloadError("x"), ServeError)  # maps to 503
        gate.set()
        t.join(timeout=10)
    finally:
        gate.set()
        b.close()


def test_decode_payload_rejects_garbage():
    with pytest.raises(ServeError):
        decode_payload(b"", 224)
    with pytest.raises(ServeError):
        decode_payload(b"definitely not an image", 224)
    with pytest.raises(ServeError):   # 4-d but only 2 channels
        decode_payload(_npy_bytes(np.zeros((2, 4, 5, 2), np.uint8)), 224)


# -- DynamicBatcher ---------------------------------------------------------

def test_batcher_pads_and_slices():
    seen = []

    def fn(batch):
        assert batch.shape == (4, 2, 2, 3)      # always the static shape
        seen.append(int((batch.sum(axis=(1, 2, 3)) > 0).sum()))
        return batch.sum(axis=(1, 2, 3))[:, None].astype(np.float32)

    b = DynamicBatcher(fn, batch_size=4, max_wait_ms=20)
    try:
        img = np.full((2, 2, 3), 7, np.uint8)
        out = b.submit(img)
        assert out.shape == (1,) and out[0] == 7 * 12
        # oversized submission splits across device batches
        imgs = np.stack([np.full((2, 2, 3), i + 1, np.uint8)
                         for i in range(10)])
        outs = b.submit_many(imgs)
        np.testing.assert_allclose(outs[:, 0],
                                   [12.0 * (i + 1) for i in range(10)])
        stats = b.stats()
        assert stats["tiles"] == 11 and stats["errors"] == 0
        assert stats["batches"] >= 3          # 1 + ceil(10/4)
    finally:
        b.close()


def test_batcher_coalesces_concurrent_requests():
    lock = threading.Lock()
    batch_fills = []

    def fn(batch):
        with lock:
            batch_fills.append(int((batch.sum(axis=(1, 2, 3)) > 0).sum()))
        s = batch.sum(axis=(1, 2, 3)).astype(np.float32)
        return np.stack([s, s], axis=1)

    b = DynamicBatcher(fn, batch_size=8, max_wait_ms=200)
    try:
        results = {}

        def post(i):
            results[i] = b.submit(np.full((2, 2, 3), i + 1, np.uint8))

        threads = [threading.Thread(target=post, args=(i,)) for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i in range(6):
            np.testing.assert_allclose(results[i], [(i + 1) * 12.0] * 2)
        # 6 requests inside a 200 ms window must not take 6 device steps
        assert sum(batch_fills) == 6 and len(batch_fills) < 6
    finally:
        b.close()


def test_batcher_propagates_errors_and_recovers():
    calls = {"n": 0}

    def fn(batch):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("boom")
        return batch.sum(axis=(1, 2, 3))[:, None]

    b = DynamicBatcher(fn, batch_size=2, max_wait_ms=1)
    try:
        with pytest.raises(RuntimeError, match="boom"):
            b.submit(np.ones((2, 2, 3), np.uint8))
        out = b.submit(np.ones((2, 2, 3), np.uint8))   # still serving
        assert out[0] == 12
        assert b.stats()["errors"] == 1
    finally:
        b.close()


def test_batcher_tuple_outputs():
    def fn(batch):
        s = batch.sum(axis=(1, 2, 3)).astype(np.float32)
        return s[:, None], np.stack([s, s], axis=1)

    b = DynamicBatcher(fn, batch_size=3, max_wait_ms=1)
    try:
        a, c = b.submit(np.full((2, 2, 3), 2, np.uint8))
        assert a.shape == (1,) and c.shape == (2,)
        a2, c2 = b.submit_many(np.ones((4, 2, 2, 3), np.uint8))
        assert a2.shape == (4, 1) and c2.shape == (4, 2)
    finally:
        b.close()


def test_batcher_pipelines_dispatch_and_fetch():
    """Dispatch/fetch overlap: the worker must dispatch batch N+1 while
    batch N's result is still being fetched (JAX async-dispatch
    double-buffering, exercised here with a lazy __array__ stand-in for
    a device future)."""
    import time as _t

    events = []
    lock = threading.Lock()

    class Lazy:
        def __init__(self, arr):
            self.arr = arr

        def __array__(self, dtype=None, copy=None):
            with lock:
                events.append("fetch_start")
            _t.sleep(0.15)
            with lock:
                events.append("fetch_end")
            return self.arr

    def fn(batch):
        with lock:
            events.append("dispatch")
        return Lazy(batch.sum(axis=(1, 2, 3))[:, None].astype(np.float32))

    b = DynamicBatcher(fn, batch_size=1, max_wait_ms=0, pipeline_depth=2)
    try:
        ts = [threading.Thread(
            target=lambda v: b.submit(np.full((2, 2, 3), v, np.uint8)),
            args=(i + 1,)) for i in range(3)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        # at least one later dispatch must land before an earlier fetch
        # completes — strictly serial execution would interleave
        # dispatch/fetch_start/fetch_end triples
        second_dispatch = [i for i, e in enumerate(events)
                           if e == "dispatch"][1]
        first_fetch_end = events.index("fetch_end")
        assert second_dispatch < first_fetch_end, events
        assert b.stats()["batches"] == 3
    finally:
        b.close()


def test_batcher_fetch_error_propagates_and_recovers():
    """An error surfacing at FETCH time (deferred device failure) fails
    that batch's waiters but keeps the batcher serving."""
    calls = {"n": 0}

    class Boom:
        def __array__(self, dtype=None, copy=None):
            raise RuntimeError("deferred-boom")

    def fn(batch):
        calls["n"] += 1
        if calls["n"] == 1:
            return Boom()
        return batch.sum(axis=(1, 2, 3))[:, None]

    b = DynamicBatcher(fn, batch_size=2, max_wait_ms=1)
    try:
        with pytest.raises(RuntimeError, match="deferred-boom"):
            b.submit(np.ones((2, 2, 3), np.uint8))
        out = b.submit(np.ones((2, 2, 3), np.uint8))
        assert out[0] == 12
        assert b.stats()["errors"] == 1
    finally:
        b.close()


def test_batcher_rejects_after_close():
    b = DynamicBatcher(lambda x: x.sum(axis=(1, 2, 3)), batch_size=1)
    b.close()
    with pytest.raises(RuntimeError, match="closed"):
        b.submit(np.ones((2, 2, 3), np.uint8))


# -- end-to-end HTTP server -------------------------------------------------

@pytest.fixture(scope="module")
def served():
    model = DuoFormer(depth=1, embed_dim=96, num_heads=12, num_classes=3,
                      num_layers=2, proj_dim=96, dtype=jnp.float32)
    import jax
    params = model.init(jax.random.PRNGKey(0))
    pred = Predictor(model, params, dtype=jnp.float32)
    server = make_server(pred, host="127.0.0.1", port=0, batch_size=4,
                         max_wait_ms=5, info={"family": "duoformer"})
    server.warmup()
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{server.server_address[1]}"
    yield url, pred
    server.shutdown()
    server.close()
    t.join(timeout=10)


def _post(url, data):
    req = urllib.request.Request(url, data=data, method="POST")
    with urllib.request.urlopen(req, timeout=60) as r:
        return json.loads(r.read())


def test_server_healthz_and_stats(served):
    url, _ = served
    with urllib.request.urlopen(url + "/healthz", timeout=30) as r:
        h = json.loads(r.read())
    assert h["status"] == "ok" and h["batch_size"] == 4
    assert h["family"] == "duoformer"
    with urllib.request.urlopen(url + "/stats", timeout=30) as r:
        s = json.loads(r.read())
    assert s["predict"]["batches"] >= 1     # warmup counted


def test_server_predict_single_image(served):
    url, pred = served
    img = np.random.default_rng(3).integers(0, 256, (224, 224, 3), np.uint8)
    out = _post(url + "/predict", _png_bytes(img))
    want = np.asarray(pred.predict_proba(img[None]))[0]
    np.testing.assert_allclose(out["probs"], want, atol=1e-5)
    assert out["pred"] == int(want.argmax())


def test_server_predict_npy_batch_spanning_device_batches(served):
    url, pred = served
    tiles = np.random.default_rng(4).integers(
        0, 256, (5, 224, 224, 3), np.uint8)       # batch_size=4 -> 2 steps
    out = _post(url + "/predict", _npy_bytes(tiles))
    assert out["n"] == 5 and len(out["probs"]) == 5
    want = np.asarray(pred.predict_proba(tiles))
    np.testing.assert_allclose(np.asarray(out["probs"]), want, atol=1e-5)
    assert out["preds"] == want.argmax(-1).tolist()


def test_server_embed(served):
    url, pred = served
    img = np.random.default_rng(5).integers(0, 256, (224, 224, 3), np.uint8)
    out = _post(url + "/embed", _png_bytes(img))
    logits, embs = pred.embed(img[None])
    assert len(out["embedding"]) == embs.shape[-1]
    np.testing.assert_allclose(out["embedding"], np.asarray(embs)[0],
                               atol=1e-4)
    assert out["pred"] == int(np.asarray(logits)[0].argmax())


def test_server_quantized_predictor(served):
    """int8 (a8w8) serving through the daemon (cli serve --quantize):
    the quantized Predictor drops in transparently and its probs stay
    close to the bf16/f32 server's."""
    url, pred = served
    model = DuoFormer(depth=1, embed_dim=96, num_heads=12, num_classes=3,
                      num_layers=2, proj_dim=96, dtype=jnp.float32)
    import jax
    params = model.init(jax.random.PRNGKey(0))
    qpred = Predictor(model, params, dtype=jnp.float32, quantize=True)
    server = make_server(qpred, host="127.0.0.1", port=0, batch_size=2,
                         max_wait_ms=1, info={"quantized": True})
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        qurl = f"http://127.0.0.1:{server.server_address[1]}"
        with urllib.request.urlopen(qurl + "/healthz", timeout=30) as r:
            assert json.loads(r.read())["quantized"] is True
        img = np.random.default_rng(6).integers(
            0, 256, (224, 224, 3), np.uint8)
        out = _post(qurl + "/predict", _png_bytes(img))
        want = np.asarray(pred.predict_proba(img[None]))[0]
        np.testing.assert_allclose(out["probs"], want, atol=0.05)
    finally:
        server.shutdown()
        server.close()
        t.join(timeout=10)


def test_server_predict_slide_mil(served):
    """POST /predict-slide: tiles -> embed batcher -> gated-attention
    MIL head -> one slide call with per-tile attention; result must
    match the offline composition (Predictor.embed + model.apply)."""
    import jax

    from duoformer_tcga_tpu.mil import save_mil, load_mil
    from duoformer_tcga_tpu.models.mil import GatedAttentionMIL

    url, pred = served
    # a tiny MIL head over the fixture model's 96-d embeddings
    mil_model = GatedAttentionMIL(embed_dim=96, hidden=8, num_classes=2)
    mil_params = mil_model.init(jax.random.PRNGKey(2))
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        mpath = f"{td}/mil.npz"
        save_mil(mpath, jax.tree.map(np.asarray, mil_params),
                 ["neg", "pos"], hidden=8)
        mil = load_mil(mpath)

    model = DuoFormer(depth=1, embed_dim=96, num_heads=12, num_classes=3,
                      num_layers=2, proj_dim=96, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0))
    pred2 = Predictor(model, params, dtype=jnp.float32)
    server = make_server(pred2, host="127.0.0.1", port=0, batch_size=4,
                         max_wait_ms=1, mil=mil)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        surl = f"http://127.0.0.1:{server.server_address[1]}"
        with urllib.request.urlopen(surl + "/healthz", timeout=30) as r:
            assert json.loads(r.read())["mil"] == ["neg", "pos"]
        tiles = np.random.default_rng(9).integers(
            0, 256, (5, 224, 224, 3), np.uint8)
        out = _post(surl + "/predict-slide", _npy_bytes(tiles))
        assert out["n_tiles"] == 5 and len(out["attention"]) == 5
        assert out["pred"] in ("neg", "pos")
        np.testing.assert_allclose(sum(out["attention"]), 1.0, rtol=1e-4)
        # offline composition must agree
        _, embs = pred2.embed(tiles)
        embs = np.asarray(embs, np.float32)
        logits = np.asarray(mil[0].apply(
            mil[1], jnp.asarray(embs)[None], jnp.ones((1, 5))))
        want = np.exp(logits[0]) / np.exp(logits[0]).sum()
        got = np.array([out["probs"]["neg"], out["probs"]["pos"]])
        np.testing.assert_allclose(got, want, atol=1e-4)
    finally:
        server.shutdown()
        server.close()
        t.join(timeout=10)


def test_server_predict_slide_without_mil_is_400(served):
    url, _ = served
    req = urllib.request.Request(
        url + "/predict-slide", data=_npy_bytes(
            np.zeros((2, 224, 224, 3), np.uint8)), method="POST")
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=60)
    assert ei.value.code == 400
    assert "mil" in json.loads(ei.value.read())["error"].lower()


def test_server_bad_payload_is_400(served):
    url, _ = served
    req = urllib.request.Request(url + "/predict", data=b"garbage",
                                 method="POST")
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=30)
    assert ei.value.code == 400
    assert "error" in json.loads(ei.value.read())


def test_server_unknown_path_is_404(served):
    url, _ = served
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(url + "/nope", timeout=30)
    assert ei.value.code == 404


def test_cli_serve_sigterm_drains(tmp_path):
    """The real daemon process (cli serve) handles SIGTERM like Ctrl-C:
    stop accepting, drain the batcher, exit 0 — the contract every
    process orchestrator (k8s, systemd) relies on."""
    import os
    import signal
    import subprocess
    import sys
    import time

    import jax

    from duoformer_tcga_tpu.inference import export_serving_artifact

    model = DuoFormer(depth=1, embed_dim=96, num_heads=12, num_classes=2,
                      num_layers=2, proj_dim=96, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0))
    art = str(tmp_path / "m.npz")
    export_serving_artifact(art, params, meta={})

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.Popen(
        [sys.executable, "-m", "duoformer_tcga_tpu.cli", "serve",
         "--preset=release-2scale", "--model.depth=1",
         "--model.embed_dim=96", "--model.proj_dim=96",
         "--model.dtype=float32", "--train.platform=cpu",
         "--train.batch_size=2", f"--params={art}", "--port=0"],
        cwd=repo, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True)
    try:
        import selectors
        sel = selectors.DefaultSelector()
        sel.register(proc.stdout, selectors.EVENT_READ)
        port = None
        # generous: on the 1-core host this subprocess competes with the
        # parent's already-resident compiled models (passes in ~30 s
        # alone, but >300 s has been seen late in the suite)
        deadline = time.monotonic() + 900
        lines = []
        while port is None:
            # select-gate each readline so a silently hung daemon trips
            # the deadline instead of blocking the suite forever
            if not sel.select(timeout=max(deadline - time.monotonic(), 0)) \
                    or time.monotonic() > deadline:
                raise TimeoutError("daemon never came up:\n" + "".join(lines))
            line = proc.stdout.readline()
            if not line:
                raise RuntimeError("daemon exited early:\n" + "".join(lines))
            lines.append(line)
            if "serving on http://" in line:
                port = int(line.split("http://127.0.0.1:")[1].split(" ")[0])
        sel.close()
        assert port
        img = np.random.default_rng(7).integers(
            0, 256, (224, 224, 3), np.uint8)
        out = _post(f"http://127.0.0.1:{port}/predict", _png_bytes(img))
        assert "probs" in out
        proc.send_signal(signal.SIGTERM)
        rest = proc.stdout.read()
        rc = proc.wait(timeout=60)
        assert rc == 0, rest
        assert "shutting down (SIGTERM)" in rest
    finally:
        if proc.poll() is None:
            proc.kill()
