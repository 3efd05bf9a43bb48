"""Optimizer, LR schedule, losses — reference-exact semantics in optax.

The reference optimizer is torch Adam with hardcoded weight decay 5e-7 and
betas (0.95, 0.999) regardless of the --weight-decay flag
(src/traintest.py:52). Torch's Adam applies weight decay as L2-into-gradient
*before* the moment updates (not decoupled AdamW), so the optax chain is
add_decayed_weights -> scale_by_adam -> lr.

The LR schedule combines (src/traintest.py:56, 92-96):
  * a staircase warmup: lr = (step/1000) * base, updated only every 50
    steps while step <= 1000;
  * MultiStepLR decay: multiply by `decay` at epochs start, start+5,
    start+10, ... (milestones = range(lrscheduler_start, 1000, 5)), where
    the epoch counter is 1-indexed and decays apply from the epoch AFTER
    each milestone.
Expressed here as a pure function of the global step so it works under jit
and restores exactly on resume.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax

WEIGHT_DECAY = 5e-7
ADAM_BETAS = (0.95, 0.999)


def psla_lr_schedule(
    base_lr: float,
    steps_per_epoch: int,
    lrscheduler_start: int = 10,
    lrscheduler_decay: float = 0.5,
    warmup: bool = True,
    milestone_stride: int = 5,
    warmup_steps: int = 1000,
    warmup_update_every: int = 50,
):
    """Returns schedule(step) -> lr, matching the reference trajectory."""

    def schedule(step):
        step = jnp.asarray(step)
        epoch = step // steps_per_epoch + 1  # 1-indexed, like traintest.py:67
        # number of milestones m in {start, start+5, ...} with m <= epoch-1
        past = (epoch - 1) - lrscheduler_start
        n_decays = jnp.where(past < 0, 0, past // milestone_stride + 1)
        lr = base_lr * lrscheduler_decay ** n_decays
        if warmup:
            # staircase INCLUDES lr=0 for steps 0-49: the reference's
            # warmup branch fires at global_step=0 (0 % 50 == 0,
            # traintest.py:92-96), setting warm_lr=0 which persists until
            # step 50 — the first 50 updates really are no-ops there too.
            warm_frac = (
                (jnp.minimum(step, warmup_steps) // warmup_update_every)
                * warmup_update_every
                / warmup_steps
            )
            lr = jnp.where(step <= warmup_steps, base_lr * warm_frac, lr)
        return lr

    return schedule


def make_optimizer(schedule, weight_decay: float = WEIGHT_DECAY):
    """torch-Adam-equivalent optax transform with L2-style weight decay."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(b1=ADAM_BETAS[0], b2=ADAM_BETAS[1], eps=1e-8),
        optax.scale_by_learning_rate(schedule),
    )


EPSILON = 1e-7


def bce_loss(probs: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """BCE on clamped sigmoid outputs (traintest.py:102-104): the model
    emits probabilities, clamp to [1e-7, 1-1e-7], mean over all elements."""
    p = jnp.clip(probs, EPSILON, 1.0 - EPSILON)
    return -jnp.mean(targets * jnp.log(p) + (1.0 - targets) * jnp.log1p(-p))


def ce_loss(probs: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """CrossEntropy on argmax targets (traintest.py:99-100). The reference
    feeds post-sigmoid probabilities to torch CE (which applies its own
    log-softmax); reproduced literally."""
    p = jnp.clip(probs, EPSILON, 1.0 - EPSILON)
    logp = _log_softmax(p)
    idx = jnp.argmax(targets, axis=1)
    return -jnp.mean(jnp.take_along_axis(logp, idx[:, None], axis=1))


def _log_softmax(x):
    x = x - jnp.max(x, axis=-1, keepdims=True)
    return x - jnp.log(jnp.sum(jnp.exp(x), axis=-1, keepdims=True))
