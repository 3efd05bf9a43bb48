"""Optimizer/schedule parity tests.

The LR trajectory must match the reference's combination of staircase
warmup (traintest.py:92-96) and MultiStepLR (traintest.py:56); the Adam
update must match torch.optim.Adam(weight_decay=5e-7, betas=(0.95, 0.999))
step-for-step (torch is the oracle)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from psla_tpu.train.optim import (
    bce_loss,
    make_optimizer,
    psla_lr_schedule,
)


def test_warmup_staircase():
    sched = psla_lr_schedule(
        base_lr=1.0, steps_per_epoch=10_000, lrscheduler_start=10, warmup=True
    )
    assert float(sched(0)) == 0.0
    assert float(sched(49)) == 0.0
    assert float(sched(50)) == pytest.approx(0.05)
    assert float(sched(99)) == pytest.approx(0.05)
    assert float(sched(999)) == pytest.approx(0.95)
    assert float(sched(1000)) == pytest.approx(1.0)
    assert float(sched(1001)) == pytest.approx(1.0)


def test_multistep_decay_trajectory():
    """start=10, stride 5: full lr through epoch 10, x0.5 in epochs 11-15,
    x0.25 in 16-20, ... (torch MultiStepLR applied after each epoch)."""
    spe = 100
    sched = psla_lr_schedule(
        base_lr=1.0, steps_per_epoch=spe, lrscheduler_start=10,
        lrscheduler_decay=0.5, warmup=False,
    )

    def lr_at_epoch(e):  # first step of 1-indexed epoch e
        return float(sched((e - 1) * spe))

    assert lr_at_epoch(1) == 1.0
    assert lr_at_epoch(10) == 1.0
    assert lr_at_epoch(11) == 0.5
    assert lr_at_epoch(15) == 0.5
    assert lr_at_epoch(16) == 0.25
    assert lr_at_epoch(21) == 0.125


def test_warmup_takes_precedence_within_first_1000_steps():
    # tiny epochs: step 1000 falls in epoch 11+, where decay would apply
    sched = psla_lr_schedule(
        base_lr=1.0, steps_per_epoch=50, lrscheduler_start=10, warmup=True
    )
    # epoch at step 700 = 15 -> decay region, but warmup overrides
    assert float(sched(700)) == pytest.approx(0.70)
    # after step 1000 decay applies: epoch 21+ -> 3 milestones (10,15,20)
    assert float(sched(1001)) == pytest.approx(0.5 ** 3)


def test_adam_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    w0 = rng.randn(5, 3).astype(np.float32)
    x = rng.randn(16, 5).astype(np.float32)
    y = (rng.rand(16, 3) > 0.5).astype(np.float32)
    lr = 1e-3

    # torch side
    wt = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.Adam([wt], lr=lr, weight_decay=5e-7, betas=(0.95, 0.999))
    for _ in range(5):
        opt.zero_grad()
        p = torch.sigmoid(torch.from_numpy(x) @ wt)
        p = torch.clamp(p, 1e-7, 1 - 1e-7)
        loss = torch.nn.functional.binary_cross_entropy(p, torch.from_numpy(y))
        loss.backward()
        opt.step()
    expected = wt.detach().numpy()

    # jax side
    tx = make_optimizer(lambda step: lr)
    params = jnp.asarray(w0)
    opt_state = tx.init(params)

    def loss_fn(w):
        return bce_loss(jax.nn.sigmoid(jnp.asarray(x) @ w), jnp.asarray(y))

    for _ in range(5):
        grads = jax.grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(np.asarray(params), expected, atol=2e-6)


def test_bce_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(1)
    p = rng.rand(8, 4).astype(np.float32)
    y = (rng.rand(8, 4) > 0.7).astype(np.float32)
    ref = torch.nn.functional.binary_cross_entropy(
        torch.clamp(torch.from_numpy(p), 1e-7, 1 - 1e-7), torch.from_numpy(y)
    ).item()
    got = float(bce_loss(jnp.asarray(p), jnp.asarray(y)))
    assert abs(got - ref) < 1e-6
