"""Parity tests for the fused Pallas fbank kernel (fbank_pallas.py).

Off-TPU (this suite runs on CPU) the kernel executes in Pallas interpreter
mode; the same kernel code compiles via Mosaic on a real chip, where its
numerics were verified against the numpy golden at <2e-4 (see module
docstring). Oracle here is the XLA GEMM lowering, which the kernel must
match to f32-summation-order tolerance, plus the zero-pad/truncate/masking
semantics of the reference (src/dataloaders/audioset_dataset.py:125-132).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from psla_tpu.frontend.fbank import FbankConfig, fbank_batched
from psla_tpu.frontend.fbank_pallas import fbank_pallas

CFG = FbankConfig()


def _ref(wav, lengths, target):
    out, _ = fbank_batched(
        jnp.asarray(wav), jnp.asarray(lengths), config=CFG, method="gemm"
    )
    out = np.asarray(out)
    m = out.shape[1]
    if m >= target:
        return out[:, :target]
    return np.pad(out, ((0, 0), (0, target - m), (0, 0)))


@pytest.fixture(scope="module")
def wavs():
    rng = np.random.default_rng(0)
    target = 104  # ragged vs the kernel's 256-frame tile
    need = CFG.buffer_length(target)
    wav = (rng.standard_normal((3, need)) * 0.1).astype(np.float32)
    lengths = np.array(
        [need, CFG.buffer_length(40), CFG.window_size - 1], np.int32
    )
    for i, n in enumerate(lengths):
        wav[i, n:] = 0.0
    return wav, lengths, target


def test_matches_gemm_path(wavs):
    wav, lengths, target = wavs
    out = np.asarray(
        fbank_pallas(
            jnp.asarray(wav), jnp.asarray(lengths), config=CFG, target_frames=target
        )
    )
    ref = _ref(wav, lengths, target)
    assert out.shape == (3, target, CFG.num_mel_bins)
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-5)


def test_short_clip_zero_padded_in_logmel_domain(wavs):
    wav, lengths, target = wavs
    out = np.asarray(
        fbank_pallas(
            jnp.asarray(wav), jnp.asarray(lengths), config=CFG, target_frames=target
        )
    )
    n1 = CFG.num_frames(int(lengths[1]))
    assert n1 < target
    assert np.all(out[1, n1:] == 0.0)  # padded frames are exactly zero
    assert np.any(out[1, :n1] != 0.0)
    # sub-window clip: zero frames everywhere
    assert np.all(out[2] == 0.0)


def test_truncation_matches_prefix(wavs):
    wav, lengths, _ = wavs
    small = 48
    out = np.asarray(
        fbank_pallas(
            jnp.asarray(wav), jnp.asarray(lengths), config=CFG, target_frames=small
        )
    )
    ref = _ref(wav, lengths, small)
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-5)


def test_no_lengths_means_full_buffers(wavs):
    wav, _, target = wavs
    out = np.asarray(
        fbank_pallas(jnp.asarray(wav), config=CFG, target_frames=target)
    )
    full = np.full(wav.shape[0], wav.shape[1], np.int32)
    ref = _ref(wav, full, target)
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-5)


def test_bf16x3_precision_mode(wavs):
    """precision='high' lowers to an explicit bf16x3 split-product in the
    kernel (Mosaic has no 3-pass dot); ~f32-grade accuracy (<=1e-3 in the
    log-mel domain, measured 6.8e-4 vs the kaldi golden on a v5e)."""
    import dataclasses

    wav, lengths, target = wavs
    cfg = dataclasses.replace(CFG, precision="high")
    out = np.asarray(
        fbank_pallas(
            jnp.asarray(wav), jnp.asarray(lengths), config=cfg, target_frames=target
        )
    )
    ref = _ref(wav, lengths, target)
    np.testing.assert_allclose(out, ref, atol=1.5e-3, rtol=1e-4)


def test_dp_eval_step_engages_shard_map_wrap(monkeypatch):
    """The Trainer's jitted steps use jit(in_shardings=...), which leaves
    the ambient abstract mesh EMPTY at trace time — with_mesh_context
    (train/step.py) must re-establish it via set_mesh so the pallas
    fbank's nested shard_map wrap engages on multi-chip DP (GSPMD cannot
    partition Mosaic kernels). Spy-asserts the wrap saw the 'data' Auto
    axis AND that outputs match the single-device pallas path."""
    import importlib

    import jax

    fp_mod = importlib.import_module("psla_tpu.frontend.fbank_pallas")
    from psla_tpu.frontend.fbank import FbankConfig
    from psla_tpu.frontend.pipeline import PreprocessConfig
    from psla_tpu.models import create_model
    from psla_tpu.parallel.mesh import make_mesh, shard_batch
    from psla_tpu.train.state import TrainState
    from psla_tpu.train.step import build_eval_step

    seen = []
    orig = fp_mod._ambient_auto_axes

    def spy():
        r = orig()
        seen.append(None if r is None else tuple(r[1]))
        return r

    monkeypatch.setattr(fp_mod, "_ambient_auto_axes", spy)
    # retrace even if an earlier test already traced these static args
    fp_mod.fbank_pallas.clear_cache()

    target = 64
    pre = PreprocessConfig(
        fbank=FbankConfig(), target_length=target, fbank_method="pallas"
    )
    rng = np.random.default_rng(1)
    b = 8
    n = pre.fbank.buffer_length(target)
    wav = (0.1 * rng.standard_normal((b, n))).astype(np.float32)
    batch = {
        "wav": wav, "wav_mean": wav.mean(1),
        "length": np.full(b, n, np.int32),
        "labels": np.eye(4, dtype=np.float32)[rng.integers(4, size=b)],
        "mix_wav": wav[::-1].copy(), "mix_wav_mean": wav.mean(1)[::-1].copy(),
        "mix_length": np.full(b, n, np.int32),
        "mix_labels": np.zeros((b, 4), np.float32),
        "n_valid": np.int32(b),
    }
    import jax.numpy as jnp2

    model = create_model("efficientnet", label_dim=4, eff_b=0, head_num=1)
    variables = model.init(
        jax.random.PRNGKey(0), jnp2.zeros((1, target, 128)), train=False
    )
    state = TrainState(
        step=jnp2.zeros((), jnp2.int32), params=variables["params"],
        batch_stats=variables.get("batch_stats", {}), opt_state=(),
    )

    probs_1dev, loss_1dev = build_eval_step(model, pre)(state, batch)

    mesh = make_mesh(8)
    step = build_eval_step(model, pre, mesh=mesh)
    seen.clear()
    probs_dp, loss_dp = step(state, shard_batch(batch, mesh))
    assert ("data",) in seen, seen  # the wrap saw the Auto data axis
    np.testing.assert_allclose(
        np.asarray(probs_dp), np.asarray(probs_1dev), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(loss_dp), np.asarray(loss_1dev), atol=1e-5
    )


def test_wrap_decision_fires_even_at_one_shard():
    """Under an active mesh context GSPMD refuses Mosaic kernels outright
    regardless of shard count, so the wrap must fire for 1-shard auto
    axes too (on-chip regression: a shards>1 guard broke single-chip
    ensemble training, where the partial-manual shard_map leaves a
    size-1 'data' auto axis)."""
    import importlib

    import jax
    from jax.sharding import Mesh

    fp_mod = importlib.import_module("psla_tpu.frontend.fbank_pallas")
    mesh1 = Mesh(np.array(jax.devices()[:1]).reshape(1, 1),
                 ("ensemble", "data"))
    with jax.sharding.set_mesh(mesh1):
        axes = fp_mod._ambient_auto_axes()
        assert axes is not None
        assert fp_mod._wrap_decision(8, axes, True) is not None
    # no mesh context -> no wrap
    assert fp_mod._wrap_decision(8, fp_mod._ambient_auto_axes(), True) is None
    # indivisible batch: no wrap in interpret mode (interpreted pallas is
    # ordinary XLA); on a real chip (interpret=False) it must fail LOUDLY
    # instead of falling through to an opaque Mosaic partitioning error
    mesh8 = Mesh(np.array(jax.devices()).reshape(-1), ("data",))
    with jax.sharding.set_mesh(mesh8):
        axes8 = fp_mod._ambient_auto_axes()
        assert fp_mod._wrap_decision(7, axes8, True) is None
        assert fp_mod._wrap_decision(8, axes8, True) is not None
        assert fp_mod._wrap_decision(8, axes8, False) is not None
        with pytest.raises(ValueError, match="not divisible"):
            fp_mod._wrap_decision(7, axes8, False)


def test_sharded_contexts_bit_exact(wavs):
    """Mosaic kernels cannot be auto-partitioned by GSPMD: under a mesh
    with Auto axes the wrapper nests a shard_map over them (sharding the
    batch dim), both inside the partial-manual ensemble shard_map
    (parallel/ensemble.py) and under plain jit + jax.sharding.set_mesh
    (multi-chip DP). fbank is per-sample, so both must be bit-exact vs
    the unsharded call."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    wav, lengths, _ = wavs
    # batch of 8 so every mesh factorization divides it
    wav = np.concatenate([wav, wav, wav[:2]])[:8]
    lengths = np.concatenate([lengths, lengths, lengths[:2]])[:8]
    target = 104
    ref = np.asarray(
        fbank_pallas(jnp.asarray(wav), jnp.asarray(lengths), config=CFG,
                     target_frames=target)
    )

    mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ("ensemble", "data"))

    with jax.sharding.set_mesh(mesh):
        wj = jax.device_put(jnp.asarray(wav), NamedSharding(mesh, P("data")))
        lj = jax.device_put(jnp.asarray(lengths), NamedSharding(mesh, P("data")))
        dp = np.asarray(
            fbank_pallas(wj, lj, config=CFG, target_frames=target)
        )
    np.testing.assert_array_equal(dp, ref)

    def body(w, l):
        return fbank_pallas(w, l, config=CFG, target_frames=target)

    smf = jax.jit(
        jax.shard_map(body, mesh=mesh, axis_names=frozenset({"ensemble"}),
                      in_specs=(P(), P()), out_specs=P())
    )
    ens = np.asarray(smf(jnp.asarray(wav), jnp.asarray(lengths)))
    np.testing.assert_array_equal(ens, ref)
