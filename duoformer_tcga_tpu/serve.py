"""HTTP serving daemon with dynamic micro-batching.

The reference has no serving story at all (its closest artifact is the
in-process `evaluation()` loop, /root/reference/main_toy.py:39-54); this
module is the long-running production counterpart: a stdlib-only HTTP
server in front of a `Predictor`, with a dynamic batcher that coalesces
concurrent requests into the ONE static batch shape the jitted TPU step
was compiled for (XLA recompiles per shape — a serving daemon must never
let request fan-in dictate the device batch).

Design:
  * `DynamicBatcher` — a single worker thread owns every device
    DISPATCH (JAX dispatch stays single-threaded); HTTP handler threads
    enqueue decoded tiles and block on per-request events. The worker
    drains up to `batch_size` tiles, waiting at most `max_wait_ms` after
    the first arrival, zero-pads to the static shape, dispatches the
    predict function, and hands the (still in-flight) device result to a
    completer thread that fetches and slices it back out — JAX dispatch
    is asynchronous, so batch N+1's host->device transfer and compute
    overlap batch N's device->host fetch (double-buffering; measured
    numbers in docs/performance.md). Oversized submissions split across
    device batches transparently.
  * `make_server` — ThreadingHTTPServer with three endpoints:
      GET  /healthz           liveness + model/config summary
      GET  /stats             request/batch/tile counters + occupancy
      POST /predict           body = image bytes (PNG/JPEG/... via PIL)
                              or an .npy payload ([H,W,3] or [N,H,W,3]
                              uint8) -> JSON probs/pred(s)
      POST /embed             same body -> pre-head CLS embedding(s)
                              (per-tile representation for MIL)
      POST /predict-slide     same body, ALL tiles = one slide -> one
                              slide-level call through the gated-
                              attention MIL head (requires --mil=;
                              returns probs + per-tile attention).
                              Bags are padded to 64-tile buckets so the
                              MIL jit compiles a bounded set of shapes
                              (the masked softmax is padding-exact).
  * `cli serve` wires weight resolution (checkpoint dir / --params= /
    --torch=) identically to `cli predict` and warms the compile before
    binding the port.
"""

from __future__ import annotations

import collections
import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

# Refuse request bodies past this size: a batch of 256 raw 224^2 uint8
# tiles is ~38 MB; 256 MB leaves ample headroom for any sane payload
# while bounding worst-case host memory per handler thread.
MAX_BODY_BYTES = 256 * 1024 * 1024

_NPY_MAGIC = b"\x93NUMPY"


class ServeError(ValueError):
    """Client-side request error (maps to HTTP 400)."""


class OverloadError(ServeError):
    """Server saturation (maps to HTTP 503 so clients retry/back off)."""


def decode_payload(data: bytes, size: int = 224) -> np.ndarray:
    """Request body -> uint8 tiles [N, size, size, 3].

    Accepts a raw .npy array ([H,W(,C)] or [N,H,W(,C)]) or any
    PIL-decodable image (PNG/JPEG/BMP/TIFF/...). Grayscale promotes to
    3 channels; >3 channels keep the first 3 (RGBA). Dtypes: uint8 as
    is; floats are treated as [0,1] when max <= 1 (scaled x255), larger
    values and wider ints are clipped to [0,255]. Images and npy tiles
    that are not size x size are bilinearly resized — the same
    convention as the folder dataset (data/folder.py:_decode)."""
    if not data:
        raise ServeError("empty request body")
    if data[:6] == _NPY_MAGIC:
        try:
            arr = np.load(io.BytesIO(data), allow_pickle=False)
        except Exception as e:
            raise ServeError(f"bad .npy payload: {e}") from None
        if arr.ndim == 2:                       # [H, W] grayscale
            arr = np.stack([arr] * 3, axis=-1)
        if arr.ndim == 3:
            if arr.shape[-1] <= 4:              # [H, W, C] single image
                arr = arr[None]
            else:                               # [N, H, W] grayscale batch
                arr = np.stack([arr] * 3, axis=-1)
        if arr.ndim != 4 or arr.shape[-1] < 3:
            raise ServeError(
                f"npy payload must be [H,W(,C)] or [N,H,W(,C)]; got "
                f"shape {arr.shape}")
        if arr.shape[0] == 0:
            raise ServeError("npy payload contains zero tiles")
        arr = np.ascontiguousarray(arr[..., :3])
        if np.issubdtype(arr.dtype, np.floating):
            if float(arr.max(initial=0.0)) <= 1.0:
                arr = arr * 255.0
        if arr.dtype != np.uint8:
            arr = np.clip(arr, 0, 255)
        arr = arr.astype(np.uint8)
        if arr.shape[1:3] != (size, size):
            from PIL import Image
            arr = np.stack([
                np.asarray(Image.fromarray(a).resize((size, size),
                                                     Image.BILINEAR),
                           dtype=np.uint8) for a in arr])
        return arr
    try:
        from PIL import Image
        with Image.open(io.BytesIO(data)) as im:
            im = im.convert("RGB")
            if im.size != (size, size):
                im = im.resize((size, size), Image.BILINEAR)
            return np.asarray(im, dtype=np.uint8)[None]
    except ServeError:
        raise
    except Exception as e:
        raise ServeError(f"payload is neither .npy nor a decodable "
                         f"image: {e}") from None


class _Pending:
    __slots__ = ("img", "event", "result", "error")

    def __init__(self, img):
        self.img = img
        self.event = threading.Event()
        self.result = None
        self.error = None


class DynamicBatcher:
    """Coalesce concurrent single-tile submissions into fixed-size device
    batches. One worker thread owns every predict-function DISPATCH;
    submitters block until their slice of the batched result is ready.

    predict_fn: uint8 [batch_size, H, W, 3] -> one array [batch_size, ...]
    or a tuple of them (each sliced per-request along axis 0). It may
    return device (JAX) arrays: dispatch and result-fetch are PIPELINED
    across two threads — JAX dispatch is asynchronous, so the worker
    launches batch N+1 (host->device transfer + compute) while the
    completer thread is still fetching batch N's results. pipeline_depth
    bounds the number of in-flight device batches (device memory =
    depth x batch). Depth 1 restores strictly serial behavior."""

    def __init__(self, predict_fn, batch_size: int,
                 max_wait_ms: float = 8.0, max_queue: int = 8192,
                 name: str = "predict", pipeline_depth: int = 2):
        if batch_size < 1:
            raise ValueError(f"batch_size must be >= 1, got {batch_size}")
        if pipeline_depth < 1:
            raise ValueError(
                f"pipeline_depth must be >= 1, got {pipeline_depth}")
        self.predict_fn = predict_fn
        self.batch_size = int(batch_size)
        self.max_wait = max(float(max_wait_ms), 0.0) / 1e3
        self.max_queue = int(max_queue)
        self.name = name
        self._cv = threading.Condition()
        self._queue = collections.deque()
        self._closed = False
        # stats (under _cv)
        self.requests = 0
        self.tiles = 0
        self.batches = 0
        self.batch_tiles = 0   # real tiles through the device (pre-pad)
        self.errors = 0
        import queue as _queue
        self._inflight = _queue.Queue(maxsize=int(pipeline_depth))
        self._completer = threading.Thread(
            target=self._complete, name=f"batcher-{name}-complete",
            daemon=True)
        self._completer.start()
        self._thread = threading.Thread(
            target=self._worker, name=f"batcher-{name}", daemon=True)
        self._thread.start()

    # -- submission -------------------------------------------------------

    def submit(self, img: np.ndarray):
        """One tile [H, W, 3] -> its result row(s)."""
        out = self.submit_many(img[None])
        return tuple(o[0] for o in out) if isinstance(out, tuple) else out[0]

    def submit_many(self, imgs: np.ndarray):
        """[N, H, W, 3] -> stacked results [N, ...] (tuple-transparent).
        N may exceed batch_size — the worker splits across device steps."""
        pendings = [_Pending(img) for img in imgs]
        if not pendings:
            raise ServeError("empty batch submission")
        with self._cv:
            if self._closed:
                raise RuntimeError(f"batcher {self.name!r} is closed")
            if len(self._queue) + len(pendings) > self.max_queue:
                self.errors += 1
                raise OverloadError(
                    f"server overloaded: queue {len(self._queue)} + "
                    f"request {len(pendings)} exceeds max_queue "
                    f"{self.max_queue}")
            self.requests += 1
            self.tiles += len(pendings)
            self._queue.extend(pendings)
            self._cv.notify_all()
        for p in pendings:
            p.event.wait()
            if p.error is not None:
                raise p.error
        first = pendings[0].result
        if isinstance(first, tuple):
            return tuple(np.stack([p.result[i] for p in pendings])
                         for i in range(len(first)))
        return np.stack([p.result for p in pendings])

    # -- worker -----------------------------------------------------------

    def _take_locked(self):
        """Wait for work, then drain up to batch_size items; after the
        first arrival wait at most max_wait for stragglers (skipped when
        the queue already fills a batch). Returns [] iff closed+drained."""
        while not self._queue:
            if self._closed:
                return []
            self._cv.wait()
        deadline = time.monotonic() + self.max_wait
        while len(self._queue) < self.batch_size and not self._closed:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            self._cv.wait(timeout=remaining)
        n = min(self.batch_size, len(self._queue))
        return [self._queue.popleft() for _ in range(n)]

    def _worker(self):
        while True:
            with self._cv:
                take = self._take_locked()
                if not take:
                    self._inflight.put(None)      # completer shutdown
                    return
                self.batches += 1
                self.batch_tiles += len(take)
            try:
                # stack/pad inside the try: the public API can be handed
                # mismatched tile shapes — a dead worker would hang every
                # waiter forever (events never set, no timeout)
                batch = np.stack([p.img for p in take])
                if len(take) < self.batch_size:   # pad to the static shape
                    batch = np.concatenate([
                        batch,
                        np.zeros((self.batch_size - len(take),
                                  *batch.shape[1:]), batch.dtype)])
                # async under JAX: returns device futures immediately, so
                # the next batch's host->device transfer and compute launch
                # while the completer fetches this one's results
                out = self.predict_fn(batch)
            except Exception as e:      # surface to every waiter, keep serving
                with self._cv:
                    self.errors += 1
                for p in take:
                    p.error = e
                    p.event.set()
                continue
            self._inflight.put((take, out))   # blocks at pipeline_depth

    def _complete(self):
        while True:
            item = self._inflight.get()
            if item is None:
                return
            take, out = item
            try:
                if isinstance(out, tuple):
                    out = tuple(np.asarray(o) for o in out)
                    for i, p in enumerate(take):
                        p.result = tuple(o[i] for o in out)
                        p.event.set()
                else:
                    out = np.asarray(out)
                    for i, p in enumerate(take):
                        p.result = out[i]
                        p.event.set()
            except Exception as e:   # a deferred device error surfaces at
                with self._cv:       # fetch time — fail the batch, keep going
                    self.errors += 1
                for p in take:
                    p.error = e
                    p.event.set()

    def stats(self) -> dict:
        with self._cv:
            return {
                "requests": self.requests, "tiles": self.tiles,
                "batches": self.batches, "errors": self.errors,
                "queued": len(self._queue),
                "mean_batch_occupancy": (
                    self.batch_tiles / (self.batches * self.batch_size)
                    if self.batches else None),
            }

    def close(self, timeout: float = 10.0):
        with self._cv:
            self._closed = True
            self._cv.notify_all()
        self._thread.join(timeout=timeout)       # drains, then sends the
        self._completer.join(timeout=timeout)    # completer its sentinel


# -- HTTP layer -------------------------------------------------------------


class _Handler(BaseHTTPRequestHandler):
    server_version = "duoformer-serve/1"
    protocol_version = "HTTP/1.1"
    # idle keep-alive connections close after this, bounding how long a
    # graceful shutdown can wait on handler threads (daemon_threads is
    # False so close() joins them — in-flight responses always finish)
    timeout = 65

    def log_message(self, fmt, *args):    # route through logging, not stderr
        import logging
        logging.getLogger("duoformer.serve").debug(
            "%s %s", self.address_string(), fmt % args)

    def _json(self, code: int, obj: dict):
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        if self.close_connection:
            # a rejected body was never read off the socket: keeping the
            # HTTP/1.1 connection alive would desync the stream (the
            # unread bytes would parse as the next request line)
            self.send_header("Connection", "close")
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        srv = self.server
        if self.path == "/healthz":
            self._json(200, {"status": "ok", **srv.info})
        elif self.path == "/stats":
            stats = {"predict": srv.batcher.stats()}
            if srv.embed_batcher is not None:
                stats["embed"] = srv.embed_batcher.stats()
            self._json(200, stats)
        else:
            self._json(404, {"error": f"unknown path {self.path}; "
                             f"endpoints: /healthz /stats /predict "
                             f"/embed /predict-slide"})

    def _read_body(self):
        length = int(self.headers.get("Content-Length") or 0)
        if length <= 0:
            self.close_connection = True     # body (if any) stays unread
            raise ServeError("missing/zero Content-Length")
        if length > MAX_BODY_BYTES:
            self.close_connection = True     # refuse to read it off the wire
            raise ServeError(f"body {length} bytes exceeds the "
                             f"{MAX_BODY_BYTES}-byte limit")
        return self.rfile.read(length)

    def do_POST(self):
        srv = self.server
        try:
            if self.path == "/predict":
                tiles = decode_payload(self._read_body(), srv.tile_size)
                probs = srv.batcher.submit_many(tiles)
                preds = probs.argmax(-1)
                if len(tiles) == 1:
                    self._json(200, {"pred": int(preds[0]),
                                     "probs": probs[0].tolist()})
                else:
                    self._json(200, {"n": len(tiles),
                                     "preds": preds.tolist(),
                                     "probs": probs.tolist()})
            elif self.path == "/embed":
                tiles = decode_payload(self._read_body(), srv.tile_size)
                eb = srv.get_embed_batcher()
                logits, embs = eb.submit_many(tiles)
                out = {"n": len(tiles),
                       "preds": logits.argmax(-1).tolist(),
                       "embeddings": embs.tolist()}
                if len(tiles) == 1:
                    out["embedding"] = out.pop("embeddings")[0]
                    out["pred"] = out.pop("preds")[0]
                self._json(200, out)
            elif self.path == "/predict-slide":
                if srv.mil is None:
                    self._json(400, {"error": "no MIL head loaded — "
                                     "start the daemon with --mil=mil.npz "
                                     "(from `cli mil-train`)"})
                    return
                tiles = decode_payload(self._read_body(), srv.tile_size)
                eb = srv.get_embed_batcher()
                _, embs = eb.submit_many(tiles)
                self._json(200, srv.mil_call(embs))
            else:
                self._json(404, {"error": f"unknown path {self.path}"})
        except OverloadError as e:       # saturation: retryable, not a
            self._json(503, {"error": str(e)})   # client bug
        except ServeError as e:
            self._json(400, {"error": str(e)})
        except Exception as e:           # keep the daemon alive
            self._json(500, {"error": f"{type(e).__name__}: {e}"})


class DuoFormerServer(ThreadingHTTPServer):
    """ThreadingHTTPServer that owns the predictor-backed batchers.

    daemon_threads is False so server_close() JOINS in-flight handler
    threads — a drained shutdown never cuts a response mid-write (the
    _Handler socket timeout bounds how long idle keep-alives linger).
    Pass bind_and_activate=False to construct without listening (warm
    the compile first, then bind_and_listen())."""
    daemon_threads = False

    def __init__(self, addr, predictor, batch_size: int,
                 max_wait_ms: float = 8.0, tta: bool = False,
                 temperature: float = 1.0, tile_size: int = 224,
                 info: dict | None = None, bind_and_activate: bool = True,
                 mil=None):
        super().__init__(addr, _Handler, bind_and_activate=bind_and_activate)
        self.predictor = predictor
        self.tile_size = tile_size
        self.mil = mil          # (model, params, meta) from mil.load_mil
        self._mil_fwd = None
        self._mil_lock = threading.Lock()
        self.info = dict(info or {}, batch_size=batch_size, tta=tta,
                         temperature=temperature,
                         mil=(mil[2].get("classes") if mil else None))
        t = float(temperature or 1.0)

        def _predict(batch):
            # device array out — the batcher's completer thread fetches,
            # overlapping with the next batch's dispatch
            return predictor.predict_proba(batch, tta=tta, temperature=t)

        self.batcher = DynamicBatcher(_predict, batch_size,
                                      max_wait_ms=max_wait_ms)
        self.embed_batcher = None
        self._embed_lock = threading.Lock()
        self._batch_size = batch_size
        self._max_wait_ms = max_wait_ms

    def get_embed_batcher(self) -> DynamicBatcher:
        """Lazy: /embed compiles a second jit (with_embedding forward) on
        first use; predict-only deployments never pay for it."""
        with self._embed_lock:
            if self.embed_batcher is None:
                pred = self.predictor

                def _embed(batch):
                    logits, embs = pred.embed(batch)
                    # f32 casts are async device ops (bf16 models emit
                    # bf16); the completer thread does the actual fetch
                    return (logits.astype("float32"),
                            embs.astype("float32"))

                self.embed_batcher = DynamicBatcher(
                    _embed, self._batch_size,
                    max_wait_ms=self._max_wait_ms, name="embed")
            return self.embed_batcher

    def mil_call(self, embs: np.ndarray) -> dict:
        """[N, D] tile embeddings (one slide) -> slide-level MIL call.
        N pads to 64-tile buckets so the jit compiles a bounded shape
        set; the masked softmax makes padding exact (models/mil.py)."""
        model, params, meta = self.mil
        if embs.shape[-1] != meta["embed_dim"]:
            raise ServeError(
                f"model embeddings are {embs.shape[-1]}-d but the MIL "
                f"head expects {meta['embed_dim']}-d")
        with self._mil_lock:
            if self._mil_fwd is None:
                import jax
                self._mil_fwd = jax.jit(
                    lambda p, e, m: model.apply(p, e, m,
                                                with_attention=True))
            n = len(embs)
            pad = -len(embs) % 64 if len(embs) % 64 else 0
            if pad:
                embs = np.concatenate(
                    [embs, np.zeros((pad, embs.shape[1]), embs.dtype)])
            mask = np.zeros((len(embs),), np.float32)
            mask[:n] = 1.0
            logits, attn = self._mil_fwd(params, embs[None], mask[None])
        import jax.nn as jnn
        probs = np.asarray(jnn.softmax(
            np.asarray(logits, np.float32)[0], -1))
        attn = np.asarray(attn)[0, :n]
        classes = meta["classes"]
        return {"n_tiles": n,
                "pred": classes[int(probs.argmax())],
                "probs": {c: float(p) for c, p in zip(classes, probs)},
                "attention": attn.tolist()}

    def warmup(self):
        """Compile (and page in) the serving step before taking traffic."""
        zeros = np.zeros((1, self.tile_size, self.tile_size, 3), np.uint8)
        t0 = time.monotonic()
        self.batcher.submit(zeros[0])
        return time.monotonic() - t0

    def bind_and_listen(self):
        """Bind + activate a server constructed with
        bind_and_activate=False — so the port only starts accepting
        AFTER warmup() compiled the serving step (readiness probes get
        connection-refused during the compile, not accepted-then-stalled
        connections)."""
        self.server_bind()
        self.server_activate()

    def close(self):
        self.batcher.close()
        if self.embed_batcher is not None:
            self.embed_batcher.close()
        super().server_close()


def make_server(predictor, host: str = "127.0.0.1", port: int = 0,
                batch_size: int = 32, max_wait_ms: float = 8.0,
                tta: bool = False, temperature: float = 1.0,
                info: dict | None = None,
                bind_and_activate: bool = True,
                mil=None) -> DuoFormerServer:
    return DuoFormerServer((host, port), predictor, batch_size,
                           max_wait_ms=max_wait_ms, tta=tta,
                           temperature=temperature, info=info,
                           bind_and_activate=bind_and_activate, mil=mil)
