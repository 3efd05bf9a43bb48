"""Serialized inference artifacts (tools/export.py): round-trip parity.

The artifact must reproduce the live pipeline (fbank 'gemm' + forward)
bit-for-bit on the same platform, accept any batch via the symbolic
dimension, average ensemble members like tools/serve.py, and load with
ZERO psla_tpu model code (only the blob + meta.json)."""

import dataclasses
import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import orbax.checkpoint as ocp
import pytest

from psla_tpu.frontend.fbank import FbankConfig
from psla_tpu.frontend.pipeline import PreprocessConfig
from psla_tpu.inference import _chunk_logmel
from psla_tpu.models import create_model
from psla_tpu.tools import export as exp_mod

TARGET = 32
N_CLASS = 5


def _config():
    return PreprocessConfig(
        fbank=FbankConfig(sample_frequency=16000.0),
        target_length=TARGET,
        norm_mean=-4.0,
        norm_std=4.0,
    )


def _model_and_members(n_members=1, dtype=jnp.float32):
    model = create_model(
        "efficientnet", label_dim=N_CLASS, eff_b=0, head_num=1, dtype=dtype
    )
    x = jnp.zeros((1, TARGET, 128), jnp.float32)
    members = []
    for seed in range(n_members):
        v = jax.jit(
            lambda k: model.init(k, x, train=False)
        )(jax.random.PRNGKey(seed))
        members.append(jax.tree.map(np.asarray, v))
    return model, members


def _reference_probs(model, members, config, wav, mean, lengths):
    """The live (non-exported) pipeline, gemm fbank like the artifact."""
    cfg = dataclasses.replace(config, fbank_method="gemm")
    logmel = _chunk_logmel(
        jnp.asarray(wav), jnp.asarray(mean), jnp.asarray(lengths), cfg
    )
    outs = [
        np.asarray(model.apply(v, logmel, train=False), np.float32)
        for v in members
    ]
    return np.mean(outs, axis=0)


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    """One symbolic-batch single-member export shared by the fast tests."""
    config = _config()
    model, members = _model_and_members()
    blob, meta = exp_mod.export_model(
        model, members, config, {0: "a", 1: "b", 2: "c", 3: "d", 4: "e"}
    )
    out = str(tmp_path_factory.mktemp("export"))
    exp_mod.save_exported(out, blob, meta)
    return out, model, members, config


def test_symbolic_batch_round_trip(artifact):
    out, model, members, config = artifact
    loaded = exp_mod.load_exported(out)
    assert loaded.fixed_batch is None
    chunk = loaded.chunk_samples
    assert chunk == config.fbank.buffer_length(TARGET)
    rng = np.random.default_rng(0)
    # the exported symbolic dim must serve batch sizes never seen at trace
    for bsz in (1, 3):
        wav = rng.standard_normal((bsz, chunk)).astype(np.float32) * 0.1
        mean = wav.mean(axis=1)
        lengths = np.full((bsz,), chunk, np.int32)
        got = loaded.probs(wav, mean, lengths)
        want = _reference_probs(model, members, config, wav, mean, lengths)
        assert got.shape == (bsz, N_CLASS)
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_meta_contract(artifact):
    out, _, _, config = artifact
    meta = json.load(open(os.path.join(out, exp_mod.META)))
    assert meta["format_version"] == exp_mod.FORMAT_VERSION
    assert meta["batch"] == "symbolic"
    assert meta["n_class"] == N_CLASS
    assert meta["names"]["0"] == "a"
    assert meta["sample_rate"] == 16000.0
    assert meta["target_length"] == TARGET
    assert "cpu" in meta["platforms"] and "tpu" in meta["platforms"]


def test_probs_defaults_and_validation(artifact):
    out, model, members, config = artifact
    loaded = exp_mod.load_exported(out)
    chunk = loaded.chunk_samples
    wav = np.random.default_rng(1).standard_normal(chunk).astype(np.float32)
    # 1-D input is promoted to B=1; default mean/lengths = full chunk
    got = loaded.probs(wav)
    want = _reference_probs(
        model, members, config, wav[None],
        np.array([wav.mean()], np.float32), np.array([chunk], np.int32),
    )
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)
    with pytest.raises(ValueError, match="chunk"):
        loaded.probs(np.zeros((1, chunk + 1), np.float32))


def test_predict_long_audio_chunks_and_weights(artifact):
    out, model, members, config = artifact
    loaded = exp_mod.load_exported(out)
    chunk = loaded.chunk_samples
    rng = np.random.default_rng(2)
    wav = rng.standard_normal(int(2.5 * chunk)).astype(np.float32) * 0.1
    got = loaded.predict(wav)
    assert got.shape == (N_CLASS,)
    # manual windowing: 3 rows, last 50% valid, full-clip mean everywhere
    rows = np.zeros((3, chunk), np.float32)
    lengths = np.zeros((3,), np.int32)
    for r in range(3):
        piece = wav[r * chunk:(r + 1) * chunk]
        rows[r, : piece.size] = piece
        lengths[r] = piece.size
    mean = np.full((3,), wav.mean(), np.float32)
    probs = loaded.probs(rows, mean, lengths)
    w = lengths.astype(np.float64)
    want = (probs * (w / w.sum())[:, None]).sum(axis=0)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)
    names = [n for n, _ in loaded.top_k(wav, k=2)]
    assert len(names) == 2 and set(names) <= {"a", "b", "c", "d", "e"}


def test_ensemble_is_member_mean():
    config = _config()
    model, members = _model_and_members(n_members=2)
    blob, meta = exp_mod.export_model(
        model, members, config, {i: str(i) for i in range(N_CLASS)}
    )
    assert meta["n_members"] == 2
    from jax import export as jexport

    loaded = exp_mod.ExportedModel(jexport.deserialize(bytearray(blob)), meta)
    chunk = loaded.chunk_samples
    wav = (np.random.default_rng(3)
           .standard_normal((2, chunk)).astype(np.float32) * 0.1)
    mean = wav.mean(axis=1)
    lengths = np.full((2,), chunk, np.int32)
    got = loaded.probs(wav, mean, lengths)
    want = _reference_probs(model, members, config, wav, mean, lengths)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_fixed_batch_artifact_pads_in_predict(tmp_path):
    config = _config()
    model, members = _model_and_members()
    blob, meta = exp_mod.export_model(
        model, members, config, {i: str(i) for i in range(N_CLASS)}, batch=2
    )
    out = str(tmp_path / "fixed")
    exp_mod.save_exported(out, blob, meta)
    loaded = exp_mod.load_exported(out)
    assert loaded.fixed_batch == 2
    chunk = loaded.chunk_samples
    with pytest.raises(ValueError, match="fixed batch"):
        loaded.probs(np.zeros((3, chunk), np.float32))
    # 3 rows through a batch-2 program: two padded calls, pad rows dropped
    wav = (np.random.default_rng(4)
           .standard_normal(int(2.5 * chunk)).astype(np.float32) * 0.1)
    got = loaded.predict(wav)
    sym_blob, sym_meta = exp_mod.export_model(
        model, members, config, {i: str(i) for i in range(N_CLASS)}
    )
    from jax import export as jexport

    sym = exp_mod.ExportedModel(
        jexport.deserialize(bytearray(sym_blob)), sym_meta
    )
    np.testing.assert_allclose(got, sym.predict(wav), rtol=0, atol=1e-6)


def test_batch_zero_rejected():
    # ADVICE r4: batch=0 used to fall through falsy checks and silently
    # produce a symbolic artifact; it must be a loud error
    config = _config()
    model, members = _model_and_members()
    with pytest.raises(ValueError, match="batch must be >= 1"):
        exp_mod.export_model(
            model, members, config,
            {i: str(i) for i in range(N_CLASS)}, batch=0,
        )


def test_skip_norm_threaded_and_recorded():
    # ADVICE r4: a skip_norm-trained model must be exportable without the
    # default mean/std silently baked in — meta records it AND the
    # numerics actually change
    model, members = _model_and_members()
    # an UNTRAINED model in eval mode saturates to ~0.5 for any input (BN
    # running stats at init collapse the variance — known non-bug), which
    # would make the norm/skip_norm outputs trivially equal; perturb the
    # member's running stats to a non-degenerate operating point
    rng = np.random.default_rng(0)
    members = [jax.tree.map(
        # clipped noise keeps BN running vars (init 1.0) positive
        lambda x: x + 0.25 * np.clip(
            rng.standard_normal(x.shape), -2, 2
        ).astype(x.dtype),
        members[0],
    )]
    cfg = _config()
    cfg_skip = dataclasses.replace(cfg, skip_norm=True)
    names = {i: str(i) for i in range(N_CLASS)}
    blob_n, meta_n = exp_mod.export_model(model, members, cfg, names)
    blob_s, meta_s = exp_mod.export_model(model, members, cfg_skip, names)
    assert meta_n["skip_norm"] is False and meta_s["skip_norm"] is True
    from jax import export as jexport

    chunk = int(meta_n["chunk_samples"])
    wav = (np.random.default_rng(6)
           .standard_normal((2, chunk)).astype(np.float32) * 0.1)
    mean = wav.mean(axis=1)
    lengths = np.full((2,), chunk, np.int32)
    p_n = exp_mod.ExportedModel(
        jexport.deserialize(bytearray(blob_n)), meta_n
    ).probs(wav, mean, lengths)
    p_s = exp_mod.ExportedModel(
        jexport.deserialize(bytearray(blob_s)), meta_s
    ).probs(wav, mean, lengths)
    assert not np.allclose(p_n, p_s)
    want = _reference_probs(model, members, cfg_skip, wav, mean, lengths)
    np.testing.assert_allclose(p_s, want, rtol=0, atol=1e-6)


BARE_LOADER = r"""
import json, os, sys
import numpy as np
# Prove the env really has no psla_tpu: the artifact must not need it.
try:
    import psla_tpu  # noqa: F401
except ModuleNotFoundError:
    pass
else:
    sys.exit("psla_tpu importable - bare-env test is not bare")
import jax
jax.config.update("jax_platforms", "cpu")
from jax import export as jexport
path, wav_npy, out_npy = sys.argv[1:4]
with open(os.path.join(path, "model.stablehlo"), "rb") as f:
    m = jexport.deserialize(bytearray(f.read()))
meta = json.load(open(os.path.join(path, "meta.json")))
wav = np.load(wav_npy)
mean = wav.mean(axis=1).astype(np.float32)
lengths = np.full((wav.shape[0],), int(meta["chunk_samples"]), np.int32)
np.save(out_npy, np.asarray(m.call(wav, mean, lengths)))
"""


def test_bare_env_subprocess_load(artifact, tmp_path):
    """The portability claim at tools/export.py:14-16, executed for real:
    a subprocess whose sys.path has NO psla_tpu (PYTHONPATH scrubbed, cwd
    outside the repo) deserializes the blob with jax.export alone and
    reproduces the live pipeline's probabilities (VERDICT r4 #4)."""
    import subprocess
    import sys

    out, model, members, config = artifact
    chunk = config.fbank.buffer_length(TARGET)
    rng = np.random.default_rng(7)
    wav = rng.standard_normal((2, chunk)).astype(np.float32) * 0.1
    np.save(tmp_path / "wav.npy", wav)
    (tmp_path / "bare_loader.py").write_text(BARE_LOADER)
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "JAX_PLATFORMS")
    }
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, "bare_loader.py", out,
         str(tmp_path / "wav.npy"), str(tmp_path / "probs.npy")],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    got = np.load(tmp_path / "probs.npy")
    want = _reference_probs(
        model, members, config, wav, wav.mean(axis=1),
        np.full((2,), chunk, np.int32),
    )
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_cli_end_to_end(tmp_path, capsys):
    label_csv = tmp_path / "labels.csv"
    label_csv.write_text(
        "index,mid,display_name\n0,/m/0,Dog\n1,/m/1,Cat\n2,/m/2,Rain\n"
    )
    model = create_model("efficientnet", label_dim=3, eff_b=0, head_num=1)
    x = jnp.zeros((1, TARGET, 128), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    ckpt_dir = str(tmp_path / "ckpt")
    ocp.PyTreeCheckpointer().save(
        ckpt_dir,
        {
            "params": jax.tree.map(np.asarray, variables["params"]),
            "batch_stats": jax.tree.map(np.asarray, variables["batch_stats"]),
        },
    )
    out = str(tmp_path / "artifact")
    rc = exp_mod.main([
        "--ckpt", ckpt_dir,
        "--out", out,
        "--label-csv", str(label_csv),
        "--eff_b", "0",
        "--att_head", "1",
        "--target_length", str(TARGET),
        "--dtype", "float32",
    ])
    assert rc == 0
    assert "exported 1 member(s), 3 classes" in capsys.readouterr().out
    loaded = exp_mod.load_exported(out)
    assert loaded.meta["model"] == {
        "name": "efficientnet", "eff_b": 0, "att_head": 1,
        "dtype": "float32",
    }
    probs = loaded.predict(
        np.random.default_rng(5).standard_normal(1000).astype(np.float32)
    )
    assert probs.shape == (3,)
    assert np.all(probs >= 0) and np.all(probs <= 1)
