"""HTTP inference server (tools/serve.py).

Drives a real ThreadingHTTPServer + InferenceEngine end-to-end on the
CPU backend: health/stats endpoints, JSON and WAV-bytes predict bodies,
numerical agreement with a direct model forward, concurrent requests
sharing a micro-batch, and the long-clip chunked path.
"""

import json
import struct
import threading
import urllib.request

import numpy as np
import pytest

import jax

from psla_tpu.frontend.fbank import FbankConfig
from psla_tpu.frontend.pipeline import PreprocessConfig
from psla_tpu.models import create_model
from psla_tpu.tools.serve import InferenceEngine, make_server

N_CLASS = 4
TARGET_LENGTH = 64
SR = 16000


def _wav_bytes(x: np.ndarray, sr: int = SR) -> bytes:
    """Minimal PCM16 WAV encoder for request bodies."""
    pcm = (np.clip(x, -1, 1) * 32767).astype("<i2").tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16)
    return hdr + fmt + b"data" + struct.pack("<I", len(pcm)) + pcm


@pytest.fixture(scope="module")
def served():
    config = PreprocessConfig(
        fbank=FbankConfig(sample_frequency=float(SR)),
        target_length=TARGET_LENGTH,
    )
    model = create_model(
        "efficientnet", label_dim=N_CLASS, eff_b=0, head_num=1
    )
    example = np.zeros((1, TARGET_LENGTH, 128), np.float32)
    variables = model.init(jax.random.PRNGKey(0), example, train=False)
    names = {i: f"class_{i}" for i in range(N_CLASS)}
    engine = InferenceEngine(
        model, variables, config, names, batch_size=4, batch_window_ms=30.0
    )
    server = make_server(engine, port=0)  # ephemeral port
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    yield base, engine, model, variables, config
    server.shutdown()
    engine.close()


def _get(url):
    with urllib.request.urlopen(url, timeout=60) as r:
        return json.loads(r.read())


def _post(url, body, ctype):
    req = urllib.request.Request(
        url, data=body, headers={"Content-Type": ctype}
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def test_healthz(served):
    base, engine, *_ = served
    h = _get(base + "/healthz")
    assert h["status"] == "ok"
    assert h["n_class"] == N_CLASS
    assert h["batch_size"] == 4


def test_predict_json_matches_direct_forward(served):
    base, engine, model, variables, config = served
    n = config.fbank.buffer_length(TARGET_LENGTH) // 2
    rng = np.random.RandomState(0)
    wav = (0.1 * rng.randn(n)).astype(np.float32)
    resp = _post(
        base + "/predict?top_k=4",
        json.dumps({"wav": wav.tolist(), "sample_rate": SR}).encode(),
        "application/json",
    )
    assert len(resp["top_k"]) == N_CLASS
    got = {e["index"]: e["prob"] for e in resp["top_k"]}

    # direct forward on the identical padded chunk
    from psla_tpu.inference import _chunk_logmel
    import jax.numpy as jnp

    buf = np.zeros(config.fbank.buffer_length(TARGET_LENGTH), np.float32)
    buf[:n] = wav
    logmel = _chunk_logmel(
        jnp.asarray(buf[None]), jnp.asarray([wav.mean()]),
        jnp.asarray([n], jnp.int32), config,
    )
    ref = np.asarray(model.apply(variables, logmel, train=False))[0]
    for i in range(N_CLASS):
        assert abs(got[i] - float(ref[i])) < 1e-4, (i, got[i], ref[i])


def test_predict_wav_bytes(served):
    base, *_ , config = served
    n = config.fbank.buffer_length(TARGET_LENGTH) // 2
    wav = (0.1 * np.random.RandomState(1).randn(n)).astype(np.float32)
    resp = _post(base + "/predict", _wav_bytes(wav), "audio/wav")
    assert len(resp["top_k"]) == N_CLASS
    assert abs(resp["duration_s"] - n / SR) < 1e-2
    probs = [e["prob"] for e in resp["top_k"]]
    assert all(0.0 <= p <= 1.0 for p in probs)
    # PCM16 round-trip of the same audio agrees with the JSON float path
    ref = _post(
        base + "/predict",
        json.dumps({"wav": wav.tolist(), "sample_rate": SR}).encode(),
        "application/json",
    )
    for a, b in zip(resp["top_k"], ref["top_k"]):
        assert a["index"] == b["index"]
        assert abs(a["prob"] - b["prob"]) < 1e-3


def test_concurrent_requests_share_batches(served):
    base, engine, *_ , config = served
    n = config.fbank.buffer_length(TARGET_LENGTH) // 3
    rng = np.random.RandomState(2)
    wavs = [(0.1 * rng.randn(n)).astype(np.float32) for _ in range(8)]
    before = dict(engine.counters)
    results = [None] * len(wavs)

    def worker(i):
        results[i] = _post(
            base + "/predict",
            json.dumps({"wav": wavs[i].tolist(), "sample_rate": SR}).encode(),
            "application/json",
        )

    threads = [
        threading.Thread(target=worker, args=(i,)) for i in range(len(wavs))
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert all(r is not None and "top_k" in r for r in results)
    d_reqs = engine.counters["requests"] - before["requests"]
    d_batches = engine.counters["batches"] - before["batches"]
    assert d_reqs == 8
    # micro-batching actually grouped concurrent requests (batch_size=4,
    # 30 ms window, 8 parallel clients -> strictly fewer batches than
    # requests)
    assert d_batches < d_reqs, (d_batches, d_reqs)


def test_long_clip_uses_chunked_path(served):
    base, engine, model, variables, config = served
    n = config.fbank.buffer_length(TARGET_LENGTH) * 2 + 123
    wav = (0.1 * np.random.RandomState(3).randn(n)).astype(np.float32)
    before = engine.counters["long_clips"]
    resp = _post(
        base + "/predict",
        json.dumps({"wav": wav.tolist(), "sample_rate": SR}).encode(),
        "application/json",
    )
    assert engine.counters["long_clips"] == before + 1
    from psla_tpu.inference import predict_long

    ref = np.asarray(predict_long(model, variables, wav, config))
    got = {e["index"]: e["prob"] for e in resp["top_k"]}
    for i in range(N_CLASS):
        assert abs(got[i] - float(ref[i])) < 1e-4


def test_mesh_sharded_engine_matches_single_device(served):
    """--num-devices N serving: the micro-batch sharded over the 8-device
    CPU mesh produces the same probabilities as the 1-device engine."""
    base, engine, model, variables, config = served
    names = {i: f"class_{i}" for i in range(N_CLASS)}
    mesh_engine = InferenceEngine(
        model, variables, config, names,
        batch_size=8, batch_window_ms=1.0, num_devices=8,
    )
    try:
        assert mesh_engine.mesh is not None
        assert mesh_engine.mesh.shape["data"] == 8
        n = config.fbank.buffer_length(TARGET_LENGTH) // 2
        wav = (0.1 * np.random.RandomState(7).randn(n)).astype(np.float32)
        got = mesh_engine.predict(wav, SR)
        ref = engine.predict(wav, SR)
        np.testing.assert_allclose(got, ref, atol=1e-5)
    finally:
        mesh_engine.close()


def test_close_drains_queued_requests(served):
    """Shutdown never strands a handler thread: requests still queued
    when the batcher exits are failed with a clean error on close()."""
    import queue as queue_mod

    from psla_tpu.tools.serve import _Request

    _, engine, model, variables, config = served
    # fresh engine so closing it doesn't affect the shared fixture
    names = {i: f"class_{i}" for i in range(N_CLASS)}
    eng = InferenceEngine(
        model, variables, config, names, batch_size=2, batch_window_ms=1.0
    )
    # stop the batcher first, then strand a request in the queue
    eng._stop.set()
    eng._queue.put(None)
    eng._thread.join(timeout=10)
    stranded = _Request(np.zeros(100, np.float32))
    eng._queue.put(stranded)
    eng.close()
    assert stranded.event.is_set()
    assert isinstance(stranded.error, RuntimeError)
    with pytest.raises(queue_mod.Empty):
        eng._queue.get_nowait()
    # and predict() refuses new work after shutdown instead of hanging
    with pytest.raises(RuntimeError, match="shutting down"):
        eng.predict(np.zeros(100, np.float32), SR)


def test_mesh_engine_rejects_indivisible_batch():
    config = PreprocessConfig(
        fbank=FbankConfig(sample_frequency=float(SR)),
        target_length=TARGET_LENGTH,
    )
    model = create_model("efficientnet", label_dim=N_CLASS, eff_b=0,
                         head_num=1)
    with pytest.raises(ValueError, match="not divisible"):
        InferenceEngine(model, {}, config, {}, batch_size=6, num_devices=4)


def test_ensemble_serving_is_mean_of_members(served):
    """Repeated --ckpt: served probabilities equal the MEAN of the
    members' individual forwards (reference ensemble.py:52-68), for both
    the batched path and the long-clip chunked path."""
    _, _, model, variables, config = served
    example = np.zeros((1, TARGET_LENGTH, 128), np.float32)
    member2 = model.init(jax.random.PRNGKey(42), example, train=False)
    names = {i: f"class_{i}" for i in range(N_CLASS)}
    eng = InferenceEngine(
        model, [variables, member2], config, names,
        batch_size=2, batch_window_ms=1.0,
    )
    server = make_server(eng, port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        assert _get(base + "/healthz")["n_members"] == 2

        n = config.fbank.buffer_length(TARGET_LENGTH) // 2
        wav = (0.1 * np.random.RandomState(11).randn(n)).astype(np.float32)
        resp = _post(
            base + "/predict?top_k=4",
            json.dumps({"wav": wav.tolist(), "sample_rate": SR}).encode(),
            "application/json",
        )
        got = {e["index"]: e["prob"] for e in resp["top_k"]}

        from psla_tpu.inference import _chunk_logmel
        import jax.numpy as jnp

        buf = np.zeros(config.fbank.buffer_length(TARGET_LENGTH), np.float32)
        buf[:n] = wav
        logmel = _chunk_logmel(
            jnp.asarray(buf[None]), jnp.asarray([wav.mean()]),
            jnp.asarray([n], jnp.int32), config,
        )
        ref = np.mean(
            [
                np.asarray(model.apply(v, logmel, train=False))[0]
                for v in (variables, member2)
            ],
            axis=0,
        )
        for i in range(N_CLASS):
            assert abs(got[i] - float(ref[i])) < 1e-4, (i, got[i], ref[i])

        # long clip: per-member chunked aggregation, then the same mean
        from psla_tpu.inference import predict_long

        long_wav = (
            0.1 * np.random.RandomState(12).randn(
                config.fbank.buffer_length(TARGET_LENGTH) * 2 + 77
            )
        ).astype(np.float32)
        got_long = eng.predict(long_wav, SR)
        ref_long = np.mean(
            [
                np.asarray(predict_long(model, v, long_wav, config))
                for v in (variables, member2)
            ],
            axis=0,
        )
        np.testing.assert_allclose(got_long, ref_long, atol=1e-5)
    finally:
        server.shutdown()
        eng.close()


def test_oversized_body_is_413(served, monkeypatch):
    import psla_tpu.tools.serve as serve_mod

    base, *_ = served
    monkeypatch.setattr(serve_mod, "MAX_BODY_BYTES", 1024)
    req = urllib.request.Request(
        base + "/predict", data=b"x" * 2048,
        headers={"Content-Type": "audio/wav"},
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=60)
    assert e.value.code == 413
    assert _get(base + "/healthz")["status"] == "ok"


def test_negative_top_k_clamps_to_empty(served):
    base, *_, config = served
    n = config.fbank.buffer_length(TARGET_LENGTH) // 4
    wav = (0.1 * np.random.RandomState(13).randn(n)).astype(np.float32)
    resp = _post(
        base + "/predict?top_k=-5",
        json.dumps({"wav": wav.tolist(), "sample_rate": SR}).encode(),
        "application/json",
    )
    assert resp["top_k"] == []


def test_shutdown_predict_is_503(served):
    """Engine failures are the server's fault: a request hitting a
    shutting-down engine gets 503, not 400."""
    _, _, model, variables, config = served
    names = {i: f"class_{i}" for i in range(N_CLASS)}
    eng = InferenceEngine(
        model, variables, config, names, batch_size=2, batch_window_ms=1.0
    )
    server = make_server(eng, port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        eng.close()  # engine down, HTTP front still up
        wav = np.zeros(100, np.float32)
        req = urllib.request.Request(
            base + "/predict",
            data=json.dumps(
                {"wav": wav.tolist(), "sample_rate": SR}
            ).encode(),
            headers={"Content-Type": "application/json"},
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=60)
        assert e.value.code == 503
        assert "shutting down" in json.loads(e.value.read())["error"]
    finally:
        server.shutdown()


def test_bad_request_is_400_and_server_survives(served):
    base, *_ = served
    req = urllib.request.Request(
        base + "/predict", data=b"not a wav",
        headers={"Content-Type": "audio/wav"},
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=60)
    assert e.value.code == 400
    assert "error" in json.loads(e.value.read())
    assert _get(base + "/healthz")["status"] == "ok"
    stats = _get(base + "/stats")
    assert stats["batches"] >= 1 and stats["mean_batch_occupancy"] >= 1.0


def test_malformed_content_length_is_400(served):
    """Non-numeric Content-Length must yield a JSON 400 (not a dropped
    connection), and a negative one must be refused BEFORE rfile.read(-1)
    can pin the handler thread until client EOF."""
    import http.client

    base, *_ = served
    hostname, port = base.split("//")[1].split(":")
    for bad in ("abc", "-5"):
        conn = http.client.HTTPConnection(hostname, int(port), timeout=60)
        conn.putrequest("POST", "/predict")
        conn.putheader("Content-Type", "audio/wav")
        conn.putheader("Content-Length", bad)
        conn.endheaders()
        resp = conn.getresponse()
        assert resp.status == 400, (bad, resp.status)
        resp.read()
        conn.close()
    # the server survived both
    assert _get(base + "/healthz")["status"] == "ok"
