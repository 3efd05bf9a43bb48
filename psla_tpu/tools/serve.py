"""Batched HTTP inference server — the production serving path.

The reference ships no serving story at all (inference is a TBD README
section, README.md:267-268; its models are evaluated only inside the
training loop). This daemon serves a trained checkpoint over HTTP with
the TPU serving pattern: ONE compiled fixed-shape program, cross-request
micro-batching so concurrent clients share each device dispatch, and the
chunked pooling-exact long-audio path for clips longer than the model
window:

    python -m psla_tpu.tools.serve --ckpt exp/as-01/models/best \
        [--ckpt exp/as-02/models/best ...] [--label-csv ...] \
        [--port 8000] [--batch-size 16] [--batch-window-ms 5]

Repeating ``--ckpt`` serves a model ENSEMBLE: every member shares one
on-device fbank per micro-batch and the E forwards run back-to-back in
the same compiled program; the response is the mean of the members'
probabilities — the reference's headline 0.474-mAP protocol
(src/ensemble/ensemble.py:52-68), served live.

API:
  * ``GET  /healthz``  -> {"status": "ok", model info}
  * ``GET  /stats``    -> request/batch counters (mean occupancy etc.)
  * ``POST /predict``  -> top-k labels. Body is either a WAV file
    (``Content-Type: audio/wav``; any PCM format csrc/wavio.cc decodes)
    or JSON ``{"wav": [float...], "sample_rate": 16000}``. Query
    ``?top_k=N`` bounds the response list.

Design notes (TPU): requests are padded into a fixed [B, samples] grid —
static shapes mean the server runs exactly one compiled program no
matter the traffic mix; the batcher thread drains up to B queued
requests per dispatch (waiting at most --batch-window-ms for stragglers)
so tail latency is one window + one model step. Clips longer than
target_length frames take the exact chunked-aggregation path
(psla_tpu/inference.py) outside the hot batch. ``--num-devices N``
shards each micro-batch over a 1-D data mesh (params replicated) for
multi-chip serving — the inference analogue of the training mesh, with
XLA deriving the (gather-only) cross-chip traffic.
"""

from __future__ import annotations

import argparse
import json
import queue
import threading
import time

import numpy as np

__all__ = ["InferenceEngine", "make_server", "main", "MAX_BODY_BYTES",
           "ServerShuttingDown"]

# largest accepted /predict body: comfortably holds an hour of PCM16 WAV
# (or ~20 min of float JSON) while bounding per-request allocation
MAX_BODY_BYTES = 128 << 20


class ServerShuttingDown(RuntimeError):
    """Raised for requests refused/abandoned because of shutdown.

    A dedicated type so the HTTP layer can map it to 503 without
    also swallowing device/XLA failures (jaxlib's XlaRuntimeError
    subclasses RuntimeError), which must surface as 500s."""


class _Request:
    __slots__ = ("wav", "event", "probs", "error")

    def __init__(self, wav: np.ndarray):
        self.wav = wav
        self.event = threading.Event()
        self.probs: np.ndarray | None = None
        self.error: Exception | None = None


class InferenceEngine:
    """Compiled model + micro-batching queue shared by HTTP workers."""

    def __init__(self, model, variables, config, names: dict,
                 batch_size: int = 16, batch_window_ms: float = 5.0,
                 num_devices: int | None = None):
        import jax
        import jax.numpy as jnp

        from psla_tpu.inference import _chunk_logmel

        self.model = model
        # a list/tuple of variable trees serves an ensemble (mean of the
        # members' probabilities, ensemble.py:52-68); a single tree is a
        # 1-member ensemble
        if not isinstance(variables, (list, tuple)):
            variables = [variables]
        self.members = tuple(variables)
        self.config = config
        self.names = names
        self.batch_size = int(batch_size)
        self.batch_window_s = float(batch_window_ms) / 1e3
        self.chunk_samples = config.fbank.buffer_length(config.target_length)
        self._queue: queue.Queue[_Request] = queue.Queue()
        self._stop = threading.Event()
        # counters are bumped from concurrent HTTP worker threads AND the
        # batcher thread; dict += is a read-modify-write, so lock it
        self._counter_lock = threading.Lock()
        self.counters = {
            "requests": 0, "batches": 0, "batched_rows": 0, "long_clips": 0,
        }

        def batch_probs(members, wav, wav_mean, lengths):
            # the fbank runs ONCE per micro-batch; the E member forwards
            # unroll back-to-back in the same program (the stacked serving
            # pattern of tools/ensemble.py — NOT vmapped, see
            # parallel/ensemble.py for the MXU + GSPMD rationale)
            logmel = _chunk_logmel.__wrapped__(wav, wav_mean, lengths, config)
            # f32 on the wire regardless of the model's compute dtype
            outs = [
                model.apply(v, logmel, train=False).astype(jnp.float32)
                for v in members
            ]
            acc = outs[0]
            for o in outs[1:]:
                acc = acc + o
            return acc / len(outs)

        if num_devices and num_devices > 1:
            # multi-chip serving: the micro-batch is sharded over a 1-D
            # 'data' mesh (params replicated) and XLA splits preprocessing
            # + forward across chips — DataParallel-style throughput
            # scaling with zero collective code (eval has no gradient
            # reduction; the only cross-chip traffic is the output gather)
            from psla_tpu.parallel.mesh import (
                batch_sharding, make_mesh, replicated_sharding,
            )

            if self.batch_size % num_devices:
                raise ValueError(
                    f"batch_size {self.batch_size} is not divisible by "
                    f"num_devices {num_devices}"
                )
            self.mesh = make_mesh(num_devices)
            data_sh = batch_sharding(self.mesh)
            repl = replicated_sharding(self.mesh)
            self.members = jax.device_put(self.members, repl)
            from psla_tpu.train.step import with_mesh_context

            # set_mesh at trace time so the pallas fbank's shard_map wrap
            # sees the data axis (GSPMD can't partition Mosaic kernels)
            self._batch_probs = with_mesh_context(
                jax.jit(
                    batch_probs,
                    in_shardings=(repl, data_sh, data_sh, data_sh),
                    out_shardings=data_sh,
                ),
                self.mesh,
            )
        else:
            self.mesh = None
            # put the member weights on device ONCE: orbax restores
            # host numpy trees, and numpy args to a jitted fn are
            # re-uploaded on EVERY dispatch - tens of MB of ensemble
            # weights per micro-batch on the hot path otherwise
            self.members = jax.device_put(self.members)
            self._batch_probs = jax.jit(batch_probs)
        self._jnp = jnp
        # compile once at startup so the first request pays no compile
        z = jnp.zeros((self.batch_size, self.chunk_samples), jnp.float32)
        self._batch_probs(
            self.members, z, jnp.zeros((self.batch_size,), jnp.float32),
            jnp.full((self.batch_size,), self.chunk_samples, jnp.int32),
        ).block_until_ready()
        self._thread = threading.Thread(target=self._batch_loop, daemon=True)
        self._thread.start()

    # ------------------------------------------------------------ public

    def _count(self, key: str, n: int = 1):
        with self._counter_lock:
            self.counters[key] += n

    def predict(self, wav: np.ndarray, sample_rate: int) -> np.ndarray:
        """[n_samples] float waveform -> [n_class] probabilities."""
        wav = np.asarray(wav, np.float32).reshape(-1)
        want = int(self.config.fbank.sample_frequency)
        if sample_rate != want:
            from psla_tpu.tools.prep_fsd import resample

            wav = resample(wav, sample_rate, want)
        self._count("requests")
        if wav.size > self.chunk_samples:
            # long clip: exact chunked aggregation, outside the hot batch
            # (predict_long's jitted applies are lru-cached per model, so
            # only the FIRST long clip pays a compile); ensemble members
            # average exactly as in the batched path
            from psla_tpu.inference import predict_long

            self._count("long_clips")
            return np.mean(
                [
                    np.asarray(predict_long(self.model, v, wav, self.config))
                    for v in self.members
                ],
                axis=0,
            )
        if self._stop.is_set():
            raise ServerShuttingDown("server shutting down")
        req = _Request(wav)
        self._queue.put(req)
        # poll the stop flag so a shutdown can never strand this thread
        # on a request the batcher already exited without serving
        while not req.event.wait(timeout=1.0):
            if self._stop.is_set() and not req.event.is_set():
                raise ServerShuttingDown("server shutting down")
        if req.error is not None:
            raise req.error
        return req.probs

    def stats(self) -> dict:
        """Consistent counter snapshot + derived occupancy."""
        with self._counter_lock:
            c = dict(self.counters)
        c["mean_batch_occupancy"] = (
            c["batched_rows"] / c["batches"] if c["batches"] else 0.0
        )
        return c

    def top_k(self, probs: np.ndarray, k: int) -> list[dict]:
        order = np.argsort(probs)[::-1][:k]
        return [
            {"label": self.names.get(int(i), str(int(i))),
             "index": int(i), "prob": float(probs[i])}
            for i in order
        ]

    def close(self):
        self._stop.set()
        self._queue.put(None)  # wake the batcher
        self._thread.join(timeout=5)
        # fail any requests still queued so their handler threads unblock
        # (ThreadingHTTPServer's threads are daemonic, but a clean error
        # response beats a stranded client)
        while True:
            try:
                req = self._queue.get_nowait()
            except queue.Empty:
                break
            if req is not None:
                req.error = ServerShuttingDown("server shutting down")
                req.event.set()

    # ----------------------------------------------------------- batcher

    def _batch_loop(self):
        jnp = self._jnp
        while not self._stop.is_set():
            item = self._queue.get()
            if item is None:
                continue
            batch = [item]
            deadline = time.monotonic() + self.batch_window_s
            while len(batch) < self.batch_size:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    nxt = self._queue.get(timeout=remaining)
                except queue.Empty:
                    break
                if nxt is None:
                    break
                batch.append(nxt)
            try:
                wav = np.zeros(
                    (self.batch_size, self.chunk_samples), np.float32
                )
                mean = np.zeros((self.batch_size,), np.float32)
                lengths = np.zeros((self.batch_size,), np.int32)
                for i, r in enumerate(batch):
                    wav[i, : r.wav.size] = r.wav
                    # DC removal uses the clip mean (reference
                    # audioset_dataset.py:96-100)
                    mean[i] = r.wav.mean() if r.wav.size else 0.0
                    lengths[i] = max(int(r.wav.size), 1)
                probs = np.asarray(
                    self._batch_probs(
                        self.members, jnp.asarray(wav),
                        jnp.asarray(mean), jnp.asarray(lengths),
                    )
                )
                for i, r in enumerate(batch):
                    r.probs = probs[i]
            except Exception as e:  # surface to every waiter, keep serving
                for r in batch:
                    r.error = e
            finally:
                self._count("batches")
                self._count("batched_rows", len(batch))
                for r in batch:
                    r.event.set()


def make_server(engine: InferenceEngine, port: int = 8000, host="127.0.0.1"):
    """ThreadingHTTPServer wired to the engine (caller runs serve_forever)."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet; /stats has the counters
            pass

        def _json(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            path = self.path.split("?")[0]
            if path == "/healthz":
                self._json(200, {
                    "status": "ok",
                    "n_class": len(engine.names),
                    "n_members": len(engine.members),
                    "batch_size": engine.batch_size,
                    "target_length": engine.config.target_length,
                })
            elif path == "/stats":
                self._json(200, engine.stats())
            else:
                self._json(404, {"error": f"unknown path {path}"})

        def do_POST(self):
            path, _, query = self.path.partition("?")
            if path != "/predict":
                self._json(404, {"error": f"unknown path {path}"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
            except ValueError:
                self._json(400, {"error": "malformed Content-Length"})
                return
            if n < 0:
                # rfile.read(-1) would block until client EOF, pinning
                # this handler thread for as long as a keep-alive
                # client holds the socket
                self._json(400, {"error": "negative Content-Length"})
                return
            if n > MAX_BODY_BYTES:
                # refuse BEFORE reading: an oversized upload must not buy
                # an unbounded allocation
                self._json(413, {
                    "error": f"body of {n} bytes exceeds the "
                             f"{MAX_BODY_BYTES}-byte limit"
                })
                return
            body = self.rfile.read(n)
            # phase 1 — parse the request: any failure is the CLIENT's (400)
            try:
                top_k = 10  # parse inside the try: bad values -> JSON 400
                for part in query.split("&"):
                    if part.startswith("top_k="):
                        top_k = max(0, int(part.split("=", 1)[1]))
                ctype = self.headers.get("Content-Type", "")
                if "json" in ctype:
                    payload = json.loads(body)
                    wav = np.asarray(payload["wav"], np.float32)
                    sr = int(payload.get("sample_rate", 16000))
                else:  # WAV bytes
                    from psla_tpu.data.wav import decode_wav

                    wav, sr = decode_wav(body)
                if sr <= 0:
                    raise ValueError(f"sample_rate must be positive, got {sr}")
            except Exception as e:
                self._json(400, {"error": f"{type(e).__name__}: {e}"})
                return
            # phase 2 — run the model: failures here are the SERVER's
            # (503 while shutting down, 500 for anything else)
            try:
                t0 = time.monotonic()
                probs = engine.predict(wav, sr)
                self._json(200, {
                    "top_k": engine.top_k(probs, top_k),
                    "duration_s": round(wav.size / sr, 3),
                    "latency_ms": round((time.monotonic() - t0) * 1e3, 2),
                })
            except ServerShuttingDown as e:
                self._json(503, {"error": f"{type(e).__name__}: {e}"})
            except Exception as e:
                self._json(500, {"error": f"{type(e).__name__}: {e}"})

    return ThreadingHTTPServer((host, port), Handler)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--ckpt", required=True, action="append",
                   help="orbax checkpoint dir or reference .pth file; "
                        "repeat to serve the mean of an ensemble "
                        "(reference ensemble.py:52-68)")
    p.add_argument("--label-csv", default=None,
                   help="default: bundled vocabulary for --dataset")
    p.add_argument("--dataset", default="audioset",
                   choices=["audioset", "fsd50k"])
    p.add_argument("--model", default="efficientnet",
                   choices=["efficientnet", "resnet", "mbnet"])
    p.add_argument("--eff_b", type=int, default=2)
    p.add_argument("--att_head", type=int, default=4)
    p.add_argument("--target_length", type=int, default=1056)
    p.add_argument("--dataset_mean", type=float, default=-4.6476)
    p.add_argument("--dataset_std", type=float, default=4.5699)
    p.add_argument("--skip_norm", action="store_true",
                   help="serve with NO normalization (for models trained "
                        "with --skip_norm)")
    p.add_argument("--sample_rate", type=int, default=16000)
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--batch-window-ms", type=float, default=5.0)
    p.add_argument("--num-devices", type=int, default=None,
                   help="shard each micro-batch over this many chips "
                        "(1-D data mesh, params replicated); default: "
                        "single device")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"],
                   help="compute dtype for the forward pass (bf16 is the "
                        "TPU serving default — checkpoint params stay f32; "
                        "use float32 for bit-parity with offline eval)")
    return p


def engine_from_args(args) -> InferenceEngine:
    from psla_tpu.data.datafiles import make_name_dict
    from psla_tpu.frontend.fbank import FbankConfig
    from psla_tpu.frontend.pipeline import PreprocessConfig
    from psla_tpu.models import create_model
    from psla_tpu.tools.predict import load_variables

    label_csv = args.label_csv
    if not label_csv:
        from psla_tpu import assets

        label_csv = assets.label_csv_for(args.dataset)
    import jax.numpy as jnp

    names = make_name_dict(label_csv)
    model = create_model(
        args.model, label_dim=len(names), eff_b=args.eff_b,
        head_num=args.att_head,
        dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32,
    )
    ckpts = args.ckpt if isinstance(args.ckpt, list) else [args.ckpt]
    variables = [load_variables(c, args.model, len(names)) for c in ckpts]
    config = PreprocessConfig(
        fbank=FbankConfig(sample_frequency=float(args.sample_rate)),
        target_length=args.target_length,
        norm_mean=args.dataset_mean,
        norm_std=args.dataset_std,
        skip_norm=args.skip_norm,
    )
    return InferenceEngine(
        model, variables, config, names,
        batch_size=args.batch_size, batch_window_ms=args.batch_window_ms,
        num_devices=args.num_devices,
    )


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    engine = engine_from_args(args)
    server = make_server(engine, port=args.port, host=args.host)
    print(f"serving on http://{args.host}:{server.server_address[1]} "
          f"(batch_size={engine.batch_size}, "
          f"window={args.batch_window_ms}ms)", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        engine.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
