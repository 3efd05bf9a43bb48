"""End-to-end accuracy-parity rehearsal against a faithful torch twin
(round-1 verdict #5: the closest achievable proxy to mAP parity without
real AudioSet/FSD50K data on this machine).

Both frameworks start from IDENTICAL weights (the twin's state_dict run
through the production checkpoint converter) and train on IDENTICAL
batches (fbanks precomputed by this framework's frontend feed the twin;
the raw waveforms feed the jitted train step, whose deterministic
preprocessing produces those same fbanks). Asserts:
  * forward parity at init (eval mode) — the BASELINE config-#1 contract
    (wav -> converted weights -> matching probabilities);
  * loss-trajectory agreement over K optimization steps;
  * both frameworks learn (final loss well below initial).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from psla_tpu.frontend.fbank import FbankConfig  # noqa: E402
from psla_tpu.frontend.pipeline import (  # noqa: E402
    PreprocessConfig,
    WavBatch,
    preprocess_eval,
)
from psla_tpu.models import EffNetAttention  # noqa: E402
from psla_tpu.models.convert import convert_checkpoint  # noqa: E402
from psla_tpu.train.optim import make_optimizer  # noqa: E402
from psla_tpu.train.state import TrainState  # noqa: E402
from psla_tpu.train.step import build_train_step  # noqa: E402
from tests.torch_twin import TwinEffNetAttention, twin_train_steps  # noqa: E402

N_CLASS = 4
T_LEN = 64
BATCH = 4
N_BATCHES = 3
N_STEPS = 9
LR = 1e-3


def _corpus(rng):
    """Synthetic tone batches: wav dict batches + matching labels."""
    pre = PreprocessConfig(
        fbank=FbankConfig(), target_length=T_LEN,
        freq_mask=0, time_mask=0, mixup_rate=0.0, noise=False,
    )
    n = pre.fbank.buffer_length(T_LEN)
    t = np.arange(n) / 16000.0
    batches, fbanks, labels = [], [], []
    for _ in range(N_BATCHES):
        cls = rng.randint(N_CLASS, size=BATCH)
        wav = np.stack([
            0.3 * np.sin(2 * np.pi * (300 + 200 * c) * t)
            + 0.02 * rng.randn(n)
            for c in cls
        ]).astype(np.float32)
        lab = np.eye(N_CLASS, dtype=np.float32)[cls]
        b = {
            "wav": wav, "wav_mean": wav.mean(1),
            "length": np.full(BATCH, n, np.int32), "labels": lab,
            "mix_wav": wav, "mix_wav_mean": wav.mean(1),
            "mix_length": np.full(BATCH, n, np.int32), "mix_labels": lab,
            "n_valid": np.int32(BATCH),
        }
        wb = WavBatch(**{k: jnp.asarray(v) for k, v in b.items()
                         if k != "n_valid"})
        batches.append(b)
        fbanks.append(np.asarray(preprocess_eval(wb, pre)))
        labels.append(lab)
    return pre, batches, fbanks, labels


@pytest.fixture(scope="module")
def twin_setup():
    rng = np.random.RandomState(11)
    pre, batches, fbanks, labels = _corpus(rng)
    torch.manual_seed(0)
    twin = TwinEffNetAttention(N_CLASS, b=0, head_num=4)
    # drop-connect off on the jax side too -> both forwards deterministic
    model = EffNetAttention(
        label_dim=N_CLASS, b=0, head_num=4, drop_connect_rate=0.0
    )
    variables = convert_checkpoint(twin.state_dict(), "efficientnet", N_CLASS)
    variables = jax.tree.map(jnp.asarray, variables)
    return pre, batches, fbanks, labels, twin, model, variables


def test_forward_parity_at_init(twin_setup):
    """wav -> converted twin weights -> probabilities match torch
    (BASELINE config #1 shape, with the twin standing in for the published
    checkpoint that cannot be downloaded on this machine)."""
    pre, batches, fbanks, labels, twin, model, variables = twin_setup
    twin.eval()
    with torch.no_grad():
        want = twin(torch.from_numpy(fbanks[0])).numpy()
    got = np.asarray(model.apply(variables, fbanks[0], train=False))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=0)


def test_forward_parity_flagship_shape():
    """One-batch forward parity at the FLAGSHIP shape: EffNet-B2 at
    T=1056 (the configuration every published AudioSet run uses,
    egs/audioset/run.sh:22-29 + Models.py:69-72), bs=2 so the CPU compile
    stays feasible. The small-shape parity tests can't see B2-only
    layers (deeper block table, 1408-dim head) or the T=1056 SAME-padding
    geometry; this pins them against the torch twin."""
    rng = np.random.RandomState(7)
    t_len, n_class = 1056, 4
    torch.manual_seed(2)
    twin = TwinEffNetAttention(n_class, b=2, head_num=4)
    model = EffNetAttention(
        label_dim=n_class, b=2, head_num=4, drop_connect_rate=0.0
    )
    variables = convert_checkpoint(twin.state_dict(), "efficientnet", n_class)
    variables = jax.tree.map(jnp.asarray, variables)
    fb = rng.randn(2, t_len, 128).astype(np.float32)
    twin.eval()
    with torch.no_grad():
        want = twin(torch.from_numpy(fb)).numpy()
    got = np.asarray(
        jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, fb)
    )
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=0)


def test_training_trajectories_agree(twin_setup):
    pre, batches, fbanks, labels, twin, model, variables = twin_setup

    # ---- this framework: jitted step on raw waveforms (preprocessing
    # fused into the step; deterministic under mixup=0/masks=0)
    schedule = lambda step: LR  # noqa: E731  (constant; twin uses the same)
    tx = make_optimizer(schedule)
    step_fn = build_train_step(model, tx, pre, "BCE")
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )
    rng = jax.random.PRNGKey(0)  # unused: no stochastic ops at these settings
    jax_losses = []
    for i in range(N_STEPS):
        state, metrics = step_fn(state, batches[i % N_BATCHES], rng)
        jax_losses.append(float(metrics["loss"]))

    # ---- the torch twin on the precomputed fbanks
    torch_losses = twin_train_steps(twin, fbanks, labels, LR, N_STEPS)

    diffs = np.abs(np.asarray(jax_losses) - np.asarray(torch_losses))
    # identical weights + identical data: step-0 loss must match to f32
    # noise; later steps may drift through Adam's sqrt(v)-amplification of
    # reduction-order noise, bounded well under the loss scale (~0.69)
    assert diffs[0] < 1e-5, (jax_losses[0], torch_losses[0])
    assert diffs.max() < 2e-2, list(zip(jax_losses, torch_losses))
    # both frameworks actually learn, by the same amount
    assert jax_losses[-1] < 0.6 * jax_losses[0]
    assert abs(jax_losses[-1] - torch_losses[-1]) < 1e-2


def test_training_trajectories_agree_stochastic():
    """Trajectory parity through the AUGMENTED path: mixup=0.5 +
    freq/time SpecAugment ON (the reference's actual training regime,
    egs/audioset/run.sh:22-29 + audioset_dataset.py:147-188; time mask
    scaled 192->24 for the T=64 test shape).

    The twin consumes the SAME stochastic draws the jitted step makes:
    the step derives its preprocessing key as split(fold_in(rng, step))[0]
    (train/step.py:124-125), so the host re-derives it per step and runs
    preprocess_train standalone to capture the post-mixup/post-mask
    (fbank, soft labels) that feed the twin. This covers what the
    deterministic test can't: Beta-lambda'd soft-label BCE, masked-bin
    gradients, and the mixup waveform math inside the compiled step."""
    rng_np = np.random.RandomState(3)
    pre = PreprocessConfig(
        fbank=FbankConfig(), target_length=T_LEN,
        freq_mask=48, time_mask=24, mixup_rate=0.5, noise=False,
    )
    n = pre.fbank.buffer_length(T_LEN)
    t = np.arange(n) / 16000.0
    batches, wav_batches = [], []
    for _ in range(N_BATCHES):
        cls = rng_np.randint(N_CLASS, size=BATCH)
        wav = np.stack([
            0.3 * np.sin(2 * np.pi * (300 + 200 * c) * t)
            + 0.02 * rng_np.randn(n)
            for c in cls
        ]).astype(np.float32)
        lab = np.eye(N_CLASS, dtype=np.float32)[cls]
        # mixup partners: the batch rolled by one (distinct wav + labels)
        b = {
            "wav": wav, "wav_mean": wav.mean(1),
            "length": np.full(BATCH, n, np.int32), "labels": lab,
            "mix_wav": np.roll(wav, 1, axis=0),
            "mix_wav_mean": np.roll(wav.mean(1), 1),
            "mix_length": np.full(BATCH, n, np.int32),
            "mix_labels": np.roll(lab, 1, axis=0),
        }
        batches.append(b)
        wav_batches.append(
            WavBatch(**{k: jnp.asarray(v) for k, v in b.items()})
        )

    torch.manual_seed(5)
    twin = TwinEffNetAttention(N_CLASS, b=0, head_num=4)
    model = EffNetAttention(
        label_dim=N_CLASS, b=0, head_num=4, drop_connect_rate=0.0
    )
    variables = convert_checkpoint(twin.state_dict(), "efficientnet", N_CLASS)
    variables = jax.tree.map(jnp.asarray, variables)

    tx = make_optimizer(lambda step: LR)
    step_fn = build_train_step(model, tx, pre, "BCE")
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )
    rng = jax.random.PRNGKey(42)

    # host-side capture of the step's exact stochastic preprocessing
    from psla_tpu.frontend.pipeline import preprocess_train
    fbanks, labels = [], []
    for i in range(N_STEPS):
        pre_key, _ = jax.random.split(jax.random.fold_in(rng, i))
        fb, lab = preprocess_train(pre_key, wav_batches[i % N_BATCHES], pre)
        fbanks.append(np.asarray(fb))
        labels.append(np.asarray(lab))
    # the capture must be genuinely stochastic: soft labels from mixup,
    # different masks per step (guards against a silently-dead RNG path)
    assert any(((0.0 < l) & (l < 1.0)).any() for l in labels)
    assert not np.array_equal(fbanks[0], fbanks[N_BATCHES])

    jax_losses = []
    for i in range(N_STEPS):
        state, metrics = step_fn(state, batches[i % N_BATCHES], rng)
        jax_losses.append(float(metrics["loss"]))
    torch_losses = twin_train_steps(twin, fbanks, labels, LR, N_STEPS)

    diffs = np.abs(np.asarray(jax_losses) - np.asarray(torch_losses))
    # step-0 tolerance is looser than the deterministic test's: the step
    # compiles preprocessing FUSED with the forward, so XLA may reassociate
    # float ops vs the standalone preprocess_train capture
    assert diffs[0] < 1e-4, (jax_losses[0], torch_losses[0])
    assert diffs.max() < 2e-2, list(zip(jax_losses, torch_losses))
    # learning check is looser than the deterministic test's 0.6x: mixup's
    # soft labels floor the BCE and masking dilutes the gradient, so 9
    # steps move the (seeded, deterministic) loss ~0.84x, not 0.6x
    assert jax_losses[-1] < 0.9 * jax_losses[0], jax_losses
    assert abs(jax_losses[-1] - torch_losses[-1]) < 1e-2
