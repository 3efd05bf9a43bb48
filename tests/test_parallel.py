"""Multi-device semantics on the 8-device virtual CPU mesh (SURVEY.md §4e).

Data-parallel training must be numerically equivalent to single-device
training (the reference's DataParallel contract), and the ensemble axis
must train genuinely independent seeds.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from psla_tpu.config import ExperimentConfig
from psla_tpu.models import create_model
from psla_tpu.parallel.ensemble import (
    build_ensemble_train_step,
    ensemble_member,
    init_ensemble_state,
)
from psla_tpu.parallel.mesh import make_mesh, shard_batch
from psla_tpu.train.optim import make_optimizer, psla_lr_schedule
from psla_tpu.train.state import TrainState
from psla_tpu.train.step import build_eval_step, build_train_step


def _setup(batch_size=8):
    cfg = ExperimentConfig(
        impretrain=False,
        n_class=6, eff_b=0, att_head=1, target_length=64, freqm=4, timem=4,
        mixup=0.5, lr=1e-3, batch_size=batch_size, warmup=False,
        bn_momentum=0.5,
    )
    pre = cfg.preprocess_config()
    model = create_model(
        cfg.model, label_dim=cfg.n_class, eff_b=cfg.eff_b,
        head_num=cfg.att_head, bn_momentum=cfg.bn_momentum,
    )
    tx = make_optimizer(psla_lr_schedule(cfg.lr, 100, warmup=False))

    rng = np.random.RandomState(0)
    n = pre.fbank.buffer_length(cfg.target_length)
    wav = (0.1 * rng.randn(batch_size, n)).astype(np.float32)
    labels = np.eye(cfg.n_class, dtype=np.float32)[
        rng.randint(cfg.n_class, size=batch_size)
    ]
    batch = {
        "wav": wav, "wav_mean": wav.mean(1), "length": np.full(batch_size, n, np.int32),
        "labels": labels, "mix_wav": wav[::-1].copy(),
        "mix_wav_mean": wav.mean(1)[::-1].copy(),
        "mix_length": np.full(batch_size, n, np.int32),
        "mix_labels": labels[::-1].copy(), "n_valid": np.int32(batch_size),
    }
    return cfg, pre, model, tx, batch


def _init_state(model, tx, pre, mesh):
    example = jnp.zeros((1, 64, 128), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), example, train=False)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )
    return jax.device_put(
        state, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    )


def test_data_parallel_matches_single_device():
    assert jax.device_count() == 8
    cfg, pre, model, tx, batch = _setup()
    results = {}
    for n_dev in (1, 8):
        mesh = make_mesh(n_dev)
        state = _init_state(model, tx, pre, mesh)
        step = build_train_step(model, tx, pre, cfg.loss, mesh=mesh)
        b = shard_batch(batch, mesh)
        rng = jax.random.PRNGKey(42)
        for _ in range(2):
            state, metrics = step(state, b, rng)
        results[n_dev] = (
            jax.tree.map(np.asarray, state.params),
            float(metrics["loss"]),
        )
    p1, l1 = results[1]
    p8, l8 = results[8]
    # reduction-order noise in sharded grad sums, amplified by two Adam
    # steps (sqrt(v̂)~0 early); observed ~7e-5 absolute on a ~0.6 loss —
    # seed-sensitive, so the bound carries headroom
    assert abs(l1 - l8) < 3e-4
    flat1 = np.concatenate([x.ravel() for x in jax.tree.leaves(p1)])
    flat8 = np.concatenate([x.ravel() for x in jax.tree.leaves(p8)])
    # Adam normalizes by sqrt(v̂): where v̂~0 (first steps), reduction-order
    # noise of ~1e-7 in sharded gradient sums is amplified to O(lr) in the
    # update. Loss matches tightly; params match to lr scale, and the bulk
    # of parameters match far tighter.
    diff = np.abs(flat1 - flat8)
    assert diff.max() < 3 * cfg.lr, diff.max()
    assert np.mean(diff) < 1e-5
    assert np.percentile(diff, 99) < 1e-4


def test_eval_step_sharded_matches_single():
    cfg, pre, model, tx, batch = _setup()
    outs = {}
    for n_dev in (1, 8):
        mesh = make_mesh(n_dev)
        state = _init_state(model, tx, pre, mesh)
        eval_step = build_eval_step(model, pre, cfg.loss, mesh=mesh)
        out, loss = eval_step(state, shard_batch(batch, mesh))
        outs[n_dev] = (np.asarray(out), np.asarray(loss))
    np.testing.assert_allclose(outs[1][0], outs[8][0], atol=1e-5)
    np.testing.assert_allclose(outs[1][1], outs[8][1], atol=1e-5)


def test_ensemble_axis_trains_independent_seeds():
    cfg, pre, model, tx, batch = _setup()
    mesh = make_mesh(ensemble=2)  # 2 x 4 mesh
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {
        "ensemble": 2, "data": 4,
    }
    example = jnp.zeros((1, 64, 128), jnp.float32)
    state = init_ensemble_state(model, tx, [0, 1], example, mesh)
    step = build_ensemble_train_step(model, tx, pre, cfg.loss, mesh, 2)
    b = shard_batch(batch, mesh)
    rngs = jax.random.split(jax.random.PRNGKey(7), 2)
    for _ in range(2):
        state, metrics = step(state, b, rngs)
    losses = np.asarray(metrics["loss"])
    assert losses.shape == (2,)
    assert np.all(np.isfinite(losses))
    # seeds initialized differently and stayed different
    m0 = ensemble_member(state, 0)
    m1 = ensemble_member(state, 1)
    d = [
        np.abs(a - b).max()
        for a, b in zip(jax.tree.leaves(m0.params), jax.tree.leaves(m1.params))
    ]
    assert max(d) > 1e-3
    assert np.all(np.asarray(state.step) == 2)


def _well_conditioned_members(model, n_members):
    """Members with noisy params AND realistic BN running stats — a
    near-init model (BN identity, collapsed variance) hides cross-member
    numeric corruption because every member's output is ~0.5."""
    example = jnp.zeros((1, 64, 128), jnp.float32)
    members = []
    for s in range(n_members):
        v = jax.tree.map(
            np.asarray, model.init(jax.random.PRNGKey(s), example, train=False)
        )
        pr = np.random.default_rng(100 + s)
        v["params"] = jax.tree.map(
            lambda x: x + pr.normal(0, 0.05, x.shape).astype(x.dtype),
            v["params"],
        )
        v["batch_stats"] = jax.tree.map(
            lambda x: np.abs(pr.normal(1, 0.3, np.shape(x))).astype(
                np.asarray(x).dtype
            ),
            v["batch_stats"],
        )
        members.append(v)
    return members


def test_ensemble_eval_sharded_matches_per_member():
    """REGRESSION (round 2): the vmapped ensemble eval formulation hit an
    XLA GSPMD bug — batched-kernel convolutions partitioned over the
    folded member axis returned values off by up to 0.10 in probability.
    The shard_map formulation must match per-member unsharded eval."""
    from psla_tpu.parallel.ensemble import build_ensemble_eval_step

    cfg, pre, model, tx, batch = _setup()
    members = _well_conditioned_members(model, 2)

    ref = []
    for v in members:
        st = TrainState(
            step=jnp.zeros((), jnp.int32), params=v["params"],
            batch_stats=v["batch_stats"], opt_state=(),
        )
        out, _ = build_eval_step(model, pre, cfg.loss)(st, batch)
        ref.append(np.asarray(out))

    mesh = make_mesh(ensemble=2)  # members genuinely sharded: 2 x 4
    from jax.sharding import NamedSharding, PartitionSpec as P

    ens = NamedSharding(mesh, P("ensemble"))
    params = jax.device_put(
        jax.tree.map(lambda *xs: np.stack(xs), *[m["params"] for m in members]),
        ens,
    )
    bstats = jax.device_put(
        jax.tree.map(
            lambda *xs: np.stack(xs), *[m["batch_stats"] for m in members]
        ),
        ens,
    )
    step = build_ensemble_eval_step(model, pre, cfg.loss, mesh, 2)
    out, _ = step(params, bstats, shard_batch(batch, mesh))
    out = np.asarray(out)
    np.testing.assert_allclose(out[0], ref[0], atol=1e-5)
    np.testing.assert_allclose(out[1], ref[1], atol=1e-5)


def test_ensemble_layout():
    """Mesh-shard + loader-shard selection for every topology class."""
    from psla_tpu.parallel.ensemble import ensemble_layout

    # single host: plain gcd, full data stream
    assert ensemble_layout(2, 8) == (2, 0, 1)
    assert ensemble_layout(3, 8) == (1, 0, 1)       # all members local
    assert ensemble_layout(10, 8) == (2, 0, 1)      # the 10-model protocol
    assert ensemble_layout(2, 1) == (1, 0, 1)       # single chip
    # multi-host, one row per host group
    assert ensemble_layout(2, 8, host_id=3, num_hosts=4) == (2, 1, 2)
    assert ensemble_layout(2, 8, host_id=1, num_hosts=4) == (2, 1, 2)
    assert ensemble_layout(2, 8, host_id=2, num_hosts=4) == (2, 0, 2)
    # whole rows per host: full stream
    assert ensemble_layout(4, 8, host_id=1, num_hosts=2) == (4, 0, 1)
    assert ensemble_layout(2, 4, host_id=1, num_hosts=2) == (2, 0, 1)
    # incompatible gcd shrinks to a host-aligned common divisor
    assert ensemble_layout(6, 6, host_id=3, num_hosts=4) == (2, 1, 2)
    """E need not equal the 'ensemble' shard count: E=4 members over a
    2-shard axis run 2 UNROLLED local members per shard (the path that
    makes 10 seeds on 8 chips — and any E on one chip — possible). Each
    member must still match its unsharded single-model eval."""
    from psla_tpu.parallel.ensemble import build_ensemble_eval_step

    cfg, pre, model, tx, batch = _setup()
    members = _well_conditioned_members(model, 4)

    ref = []
    for v in members:
        st = TrainState(
            step=jnp.zeros((), jnp.int32), params=v["params"],
            batch_stats=v["batch_stats"], opt_state=(),
        )
        out, _ = build_eval_step(model, pre, cfg.loss)(st, batch)
        ref.append(np.asarray(out))

    mesh = make_mesh(ensemble=2)  # 4 members -> 2 shards x 2 local
    from jax.sharding import NamedSharding, PartitionSpec as P

    ens = NamedSharding(mesh, P("ensemble"))
    params = jax.device_put(
        jax.tree.map(lambda *xs: np.stack(xs), *[m["params"] for m in members]),
        ens,
    )
    bstats = jax.device_put(
        jax.tree.map(
            lambda *xs: np.stack(xs), *[m["batch_stats"] for m in members]
        ),
        ens,
    )
    step = build_ensemble_eval_step(model, pre, cfg.loss, mesh, 4)
    out = np.asarray(step(params, bstats, shard_batch(batch, mesh))[0])
    assert out.shape[0] == 4
    for i in range(4):
        np.testing.assert_allclose(out[i], ref[i], atol=1e-5)


def test_ensemble_train_single_shard_axis_matches_per_seed():
    """A degenerate (1, n) mesh — every member local, the single-chip
    ensemble layout — must train each seed exactly like the 2-shard mesh
    path (same fold_in-derived global seed indices)."""
    from psla_tpu.parallel.ensemble import (
        build_ensemble_train_step_single_rng,
    )

    cfg, pre, model, tx, batch = _setup()
    example = jnp.zeros((1, 64, 128), jnp.float32)
    rng = jax.random.PRNGKey(7)

    def run(mesh):
        state = init_ensemble_state(model, tx, [0, 1], example, mesh)
        step = build_ensemble_train_step_single_rng(
            model, tx, pre, cfg.loss, mesh, 2
        )
        state, metrics = step(state, shard_batch(batch, mesh), rng)
        return (
            jax.tree.map(np.asarray, state),
            np.asarray(metrics["seed_loss"]),
        )

    s1, loss1 = run(make_mesh(ensemble=1, ensemble_axis=True))  # (1, 8)
    s2, loss2 = run(make_mesh(ensemble=2))                      # (2, 4)
    np.testing.assert_allclose(loss1, loss2, atol=3e-4)
    for i in range(2):
        a = ensemble_member(s1, i).params
        b = ensemble_member(s2, i).params
        diffs = [
            np.abs(x - y).max()
            for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
        ]
        # different 'data'-axis widths reduce gradients in a different
        # order; near-zero grads can flip an Adam update's sign, so a few
        # leaves land ~lr apart while most match to float precision
        assert max(diffs) < 3 * cfg.lr, max(diffs)
        assert np.mean(diffs) < 3e-4, np.mean(diffs)


def test_ensemble_train_sharded_matches_per_seed():
    """Each seed of the sharded ensemble train step must update exactly as
    the same seed trained alone through the single-model train step."""
    cfg, pre, model, tx, batch = _setup()
    mesh = make_mesh(ensemble=2)
    example = jnp.zeros((1, 64, 128), jnp.float32)
    state = init_ensemble_state(model, tx, [0, 1], example, mesh)
    host_state = jax.tree.map(np.asarray, state)
    step = build_ensemble_train_step(model, tx, pre, cfg.loss, mesh, 2)
    rngs = jax.random.split(jax.random.PRNGKey(7), 2)
    new_state, metrics = step(state, shard_batch(batch, mesh), rngs)

    for i in range(2):
        single = build_train_step(model, tx, pre, cfg.loss, mesh=make_mesh(1))
        st_i = ensemble_member(host_state, i)
        ref_state, ref_metrics = single(
            jax.device_put(st_i), jax.device_put(batch), rngs[i]
        )
        np.testing.assert_allclose(
            float(np.asarray(metrics["loss"])[i]),
            float(ref_metrics["loss"]), atol=3e-4,
        )
        got = ensemble_member(jax.tree.map(np.asarray, new_state), i)
        diffs = [
            np.abs(a - b).max()
            for a, b in zip(
                jax.tree.leaves(got.params),
                jax.tree.leaves(jax.tree.map(np.asarray, ref_state.params)),
            )
        ]
        assert max(diffs) < 3 * cfg.lr, max(diffs)
        assert np.mean(diffs) < 1e-4


@pytest.fixture
def preserve_dryrun_cache():
    """Drop cache blobs a dryrun adds to the COMMITTED .cache/xla_dryrun.

    The dryrun tests below exercise non-driver shapes (n_devices=2) whose
    compiled programs hash to keys the committed cache deliberately does
    not carry; leaving them behind would trip test_graft_entry.py's
    committed-cache freshness assert on the next suite run.
    """
    import os

    import __graft_entry__ as g

    cache = g._dryrun_cache_dir()
    before = set(os.listdir(cache))
    yield
    for name in set(os.listdir(cache)) - before:
        os.remove(os.path.join(cache, name))


def test_graft_entry_dryrun(preserve_dryrun_cache):
    import os

    import __graft_entry__ as g

    prev_cache_dir = jax.config.jax_compilation_cache_dir
    g.dryrun_multichip(8)
    g.dryrun_multichip(2)
    # The dryrun must not leak its persistent cache into the calling
    # process (round-4 bug: the pytest process kept writing every later
    # test's compiles into the committed cache dir). The config-value
    # check alone is NOT sufficient — jax memoizes the cache object on
    # first use — so also compile a fresh slow-enough program and assert
    # it does NOT land in the committed dir.
    assert jax.config.jax_compilation_cache_dir == prev_cache_dir
    cache = g._dryrun_cache_dir()
    after_dryrun = set(os.listdir(cache))

    def throwaway(x):
        for _ in range(60):  # enough compile time to exceed any
            x = jnp.tanh(x @ x)  # persistent-cache minimum threshold
        return x

    jax.jit(throwaway)(jnp.ones((37, 37))).block_until_ready()
    leaked = set(os.listdir(cache)) - after_dryrun
    assert not leaked, (
        f"dryrun_multichip left the persistent compilation cache attached "
        f"to the committed dir; later compiles leaked: {sorted(leaked)}"
    )


def test_graft_entry_dryrun_respawn(preserve_dryrun_cache):
    # the subprocess re-exec path the driver hits when jax is bound to a
    # non-CPU backend (VERDICT round 1: MULTICHIP_r01 ok=false) — must
    # build its own CPU mesh and succeed regardless of caller environment
    import __graft_entry__ as g

    g._respawn_on_cpu_mesh(2)
