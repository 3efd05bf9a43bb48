import sys, json, time
import numpy as np
method = sys.argv[1]
import jax, jax.numpy as jnp
from psla_tpu.config import ExperimentConfig
from psla_tpu.models import create_model
from psla_tpu.train.optim import make_optimizer, psla_lr_schedule
from psla_tpu.train.state import TrainState
from psla_tpu.train.step import build_train_step
from bench import _make_batch

bs = 128
cfg = ExperimentConfig(dtype="bfloat16", batch_size=bs, fbank_method=method)
pre = cfg.preprocess_config()
model = create_model(cfg.model, label_dim=cfg.n_class, eff_b=cfg.eff_b,
                     head_num=cfg.att_head, dtype=jnp.bfloat16)
tx = make_optimizer(psla_lr_schedule(cfg.lr, steps_per_epoch=20000))
example = jnp.zeros((1, cfg.target_length, cfg.num_mel_bins), jnp.float32)
variables = jax.jit(lambda k: model.init(k, example, train=False))(jax.random.PRNGKey(0))
params = variables["params"]
state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                   batch_stats=variables.get("batch_stats", {}),
                   opt_state=tx.init(params))
step_fn = build_train_step(model, tx, pre, cfg.loss, mesh=None)
batch = jax.device_put(_make_batch(bs, pre))
rng = jax.random.PRNGKey(1)
for _ in range(3):
    state, metrics = step_fn(state, batch, rng)
jax.block_until_ready(metrics["loss"])
for steps in (10, 10):
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step_fn(state, batch, rng)
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0
    print(f"{method}: {bs*steps/dt:.0f} clips/s  ({dt/steps*1e3:.1f} ms/step)", flush=True)
