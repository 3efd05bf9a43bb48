"""Turnkey ImageNet pretraining (--impretrain True, the "P" of PSLA).

The reference auto-loads ImageNet weights (Models.py:69-72 for effnet,
Models.py:18/51 torchvision for resnet/mbnet). Here: resolution order
(env var > cache glob), the LOUD failure when nothing is resolvable
(round-1 verdict: silent from-scratch training is a bug), and full
Trainer.init_state loading for all three model families.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from psla_tpu.models import create_model
from psla_tpu.models.pretrained import (
    MissingPretrainedError,
    find_imagenet_checkpoint,
    resolve_imagenet_checkpoint,
)
from tests.test_convert import _imagenet_state_dict, _tree_spec


@pytest.fixture
def isolated_cache(tmp_path, monkeypatch):
    """Point every search location at an empty tmp dir; no downloads."""
    cache = tmp_path / "cache"
    cache.mkdir()
    monkeypatch.setenv("PSLA_TPU_CACHE", str(cache))
    monkeypatch.setenv("PSLA_TPU_NO_DOWNLOAD", "1")
    monkeypatch.delenv("PSLA_TPU_IMAGENET_CKPT", raising=False)
    # HOME too, so a developer's real torch hub cache can't leak in
    monkeypatch.setenv("HOME", str(tmp_path))
    return str(cache)


def test_resolve_env_var_wins(isolated_cache, tmp_path, monkeypatch):
    p = tmp_path / "weights.pth"
    p.write_bytes(b"x")
    monkeypatch.setenv("PSLA_TPU_IMAGENET_CKPT", str(p))
    assert resolve_imagenet_checkpoint("efficientnet", 2) == str(p)


def test_resolve_env_var_missing_raises(isolated_cache, monkeypatch):
    monkeypatch.setenv("PSLA_TPU_IMAGENET_CKPT", "/nonexistent/w.pth")
    with pytest.raises(MissingPretrainedError, match="does not exist"):
        resolve_imagenet_checkpoint("efficientnet", 2)


def test_resolve_cache_glob(isolated_cache):
    path = os.path.join(isolated_cache, "efficientnet-b2-8bb594d6.pth")
    open(path, "wb").write(b"x")
    assert resolve_imagenet_checkpoint("efficientnet", 2) == path
    # the advprop release resolves too
    os.remove(path)
    adv = os.path.join(isolated_cache, "adv-efficientnet-b2-6e9d97e5.pth")
    open(adv, "wb").write(b"x")
    assert resolve_imagenet_checkpoint("efficientnet", 2) == adv
    # but not for a different compound coefficient
    assert find_imagenet_checkpoint("efficientnet", 0) is None


def test_resolve_missing_raises_with_instructions(isolated_cache):
    with pytest.raises(MissingPretrainedError) as exc:
        resolve_imagenet_checkpoint("efficientnet", 2)
    msg = str(exc.value)
    assert "efficientnet-b2" in msg          # names the exact file
    assert "PSLA_TPU_IMAGENET_CKPT" in msg   # names the env var
    assert "--impretrain False" in msg       # names the escape hatch


def _save_pth(sd, path):
    import torch

    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               path)


def _make_trainer(tmp_path, **overrides):
    from psla_tpu.config import ExperimentConfig
    from psla_tpu.data import AudioLoader, LoaderConfig, load_datafile
    from psla_tpu.train import Trainer
    from tests.synth import build_corpus

    datafile, label_csv = build_corpus(
        str(tmp_path / "corpus"), num_classes=3, clips_per_class=2,
        seconds=0.5, multi_label_frac=0.0,
    )
    cfg = ExperimentConfig(
        data_train=datafile, data_val=datafile, label_csv=label_csv,
        exp_dir=str(tmp_path / "exp"), n_class=3, eff_b=0, att_head=4,
        target_length=64, batch_size=4, n_epochs=1, num_workers=1,
        **overrides,
    )
    df = load_datafile(datafile, label_csv)
    buf = cfg.preprocess_config().fbank.buffer_length(cfg.target_length)
    lc = LoaderConfig(batch_size=4, buffer_samples=buf, num_workers=1)
    loader = AudioLoader(df, lc, shuffle=False)
    return Trainer(cfg, loader, loader)


def test_trainer_impretrain_missing_is_loud(isolated_cache, tmp_path):
    trainer = _make_trainer(tmp_path, impretrain=True)
    with pytest.raises(MissingPretrainedError):
        trainer.init_state()


def test_trainer_impretrain_loads_imagenet_effnet(isolated_cache, tmp_path):
    pytest.importorskip("torch")
    rng = np.random.RandomState(3)
    sd = _imagenet_state_dict(0, rng)
    _save_pth(sd, os.path.join(isolated_cache, "efficientnet-b0-test.pth"))

    trainer = _make_trainer(tmp_path, impretrain=True)
    state = trainer.init_state()
    # stem = RGB collapse by summation, in HWIO
    expect_stem = np.transpose(sd["_conv_stem.weight"], (2, 3, 1, 0)).sum(
        2, keepdims=True
    )
    np.testing.assert_allclose(
        np.asarray(state.params["effnet"]["stem"]["conv"]["kernel"]),
        expect_stem, rtol=1e-6,
    )
    # a converted backbone BN stat too (not just the stem)
    np.testing.assert_allclose(
        np.asarray(state.batch_stats["effnet"]["head"]["bn"]["mean"]),
        sd["_bn1.running_mean"], rtol=1e-6,
    )


def test_ensemble_impretrain_shares_backbone(isolated_cache, tmp_path):
    """--ensemble-seeds + --impretrain: every seed gets the SAME pretrained
    backbone while pooling heads stay per-seed fresh (the reference
    protocol: each ensemble member starts from ImageNet + its own head)."""
    pytest.importorskip("torch")
    from psla_tpu.data import AudioLoader, LoaderConfig, load_datafile
    from psla_tpu.config import ExperimentConfig
    from psla_tpu.train.ensemble_loop import EnsembleTrainer
    from tests.synth import build_corpus

    rng = np.random.RandomState(4)
    sd = _imagenet_state_dict(0, rng)
    _save_pth(sd, os.path.join(isolated_cache, "efficientnet-b0-test.pth"))

    datafile, label_csv = build_corpus(
        str(tmp_path / "corpus"), num_classes=3, clips_per_class=2,
        seconds=0.5, multi_label_frac=0.0,
    )
    cfg = ExperimentConfig(
        data_train=datafile, data_val=datafile, label_csv=label_csv,
        exp_dir=str(tmp_path / "exp"), n_class=3, eff_b=0, att_head=4,
        target_length=64, batch_size=8, n_epochs=1, num_workers=1,
        impretrain=True, ensemble_seeds=2,
    )
    df = load_datafile(datafile, label_csv)
    buf = cfg.preprocess_config().fbank.buffer_length(cfg.target_length)
    lc = LoaderConfig(batch_size=8, buffer_samples=buf, num_workers=1)
    loader = AudioLoader(df, lc, shuffle=False)
    trainer = EnsembleTrainer(cfg, loader, loader)
    state = trainer.init_state()

    stem = np.asarray(state.params["effnet"]["stem"]["conv"]["kernel"])
    assert stem.shape[0] == 2  # seed-stacked
    # both seeds carry the SAME converted ImageNet stem (RGB sum collapse)
    expect = np.transpose(sd["_conv_stem.weight"], (2, 3, 1, 0)).sum(
        2, keepdims=True
    )
    np.testing.assert_allclose(stem[0], expect, rtol=1e-6)
    np.testing.assert_array_equal(stem[0], stem[1])
    # heads differ per seed (fresh init)
    hk = np.asarray(state.params["attention"]["heads"]["kernel"])
    assert np.abs(hk[0] - hk[1]).max() > 1e-4


def test_ensemble_impretrain_per_seed_stems(isolated_cache, tmp_path):
    """Leaves the converter takes FRESH from the init — mbnet's 1-channel
    stem — must be independent per seed (the reference protocol runs each
    ensemble member as a separate job with its own torch init), while the
    pretrained backbone is shared."""
    pytest.importorskip("torch")
    from psla_tpu.data import AudioLoader, LoaderConfig, load_datafile
    from psla_tpu.config import ExperimentConfig
    from psla_tpu.train.ensemble_loop import EnsembleTrainer
    from tests.synth import build_corpus

    rng = np.random.RandomState(7)
    sd = _mobilenet_v2_imagenet_sd(rng)
    _save_pth(sd, os.path.join(isolated_cache, "mobilenet_v2-test.pth"))

    datafile, label_csv = build_corpus(
        str(tmp_path / "corpus"), num_classes=3, clips_per_class=2,
        seconds=0.5, multi_label_frac=0.0,
    )
    cfg = ExperimentConfig(
        data_train=datafile, data_val=datafile, label_csv=label_csv,
        exp_dir=str(tmp_path / "exp"), n_class=3, model="mbnet",
        target_length=64, batch_size=8, n_epochs=1, num_workers=1,
        impretrain=True, ensemble_seeds=2,
    )
    df = load_datafile(datafile, label_csv)
    buf = cfg.preprocess_config().fbank.buffer_length(cfg.target_length)
    lc = LoaderConfig(batch_size=8, buffer_samples=buf, num_workers=1)
    loader = AudioLoader(df, lc, shuffle=False)
    trainer = EnsembleTrainer(cfg, loader, loader)
    state = trainer.init_state()

    stem = np.asarray(state.params["stem"]["conv"]["kernel"])
    assert stem.shape[0] == 2
    # per-seed INDEPENDENT fresh stems (not one shared random draw)
    assert np.abs(stem[0] - stem[1]).max() > 1e-6
    # backbone BN stats pretrained + shared across seeds
    head_mean = np.asarray(state.batch_stats["head"]["bn"]["mean"])
    np.testing.assert_allclose(
        head_mean[0], sd["features.18.1.running_mean"], rtol=1e-6
    )
    np.testing.assert_array_equal(head_mean[0], head_mean[1])
    # classifier fresh + per-seed
    ck = np.asarray(state.params["classifier"]["kernel"])
    assert np.abs(ck[0] - ck[1]).max() > 1e-4


# ---------------- torchvision-layout ImageNet backbones (resnet / mbnet)


def _resnet50_imagenet_sd(rng):
    """Raw torchvision resnet50 state_dict (3-channel stem, fc head)."""
    sd = {}

    def r(*shape):
        return rng.randn(*shape).astype(np.float32) * 0.05

    def bn(key, c):
        sd[f"{key}.weight"] = np.abs(r(c)) + 1.0
        sd[f"{key}.bias"] = r(c)
        sd[f"{key}.running_mean"] = r(c)
        sd[f"{key}.running_var"] = np.abs(r(c)) + 1.0
        sd[f"{key}.num_batches_tracked"] = np.array(100)

    sd["conv1.weight"] = r(64, 3, 7, 7)
    bn("bn1", 64)
    in_c = 64
    for li, (w, out, n) in enumerate(
        [(64, 256, 3), (128, 512, 4), (256, 1024, 6), (512, 2048, 3)], 1
    ):
        for j in range(n):
            t = f"layer{li}.{j}"
            cin = in_c if j == 0 else out
            sd[f"{t}.conv1.weight"] = r(w, cin, 1, 1)
            bn(f"{t}.bn1", w)
            sd[f"{t}.conv2.weight"] = r(w, w, 3, 3)
            bn(f"{t}.bn2", w)
            sd[f"{t}.conv3.weight"] = r(out, w, 1, 1)
            bn(f"{t}.bn3", out)
            if j == 0:
                sd[f"{t}.downsample.0.weight"] = r(out, cin, 1, 1)
                bn(f"{t}.downsample.1", out)
        in_c = out
    sd["fc.weight"] = r(1000, 2048)
    sd["fc.bias"] = r(1000)
    return sd


def _mobilenet_v2_imagenet_sd(rng):
    """Raw torchvision mobilenet_v2 state_dict."""
    from psla_tpu.models.mobilenet import INVERTED_RESIDUAL_SETTINGS

    sd = {}

    def r(*shape):
        return rng.randn(*shape).astype(np.float32) * 0.05

    def bn(key, c):
        sd[f"{key}.weight"] = np.abs(r(c)) + 1.0
        sd[f"{key}.bias"] = r(c)
        sd[f"{key}.running_mean"] = r(c)
        sd[f"{key}.running_var"] = np.abs(r(c)) + 1.0
        sd[f"{key}.num_batches_tracked"] = np.array(100)

    sd["features.0.0.weight"] = r(32, 3, 3, 3)
    bn("features.0.1", 32)
    in_c, feat = 32, 1
    for t_ratio, c, n, _ in INVERTED_RESIDUAL_SETTINGS:
        for _ in range(n):
            base = f"features.{feat}.conv"
            exp = in_c * t_ratio
            if t_ratio == 1:
                sd[f"{base}.0.0.weight"] = r(exp, 1, 3, 3)
                bn(f"{base}.0.1", exp)
                sd[f"{base}.1.weight"] = r(c, exp, 1, 1)
                bn(f"{base}.2", c)
            else:
                sd[f"{base}.0.0.weight"] = r(exp, in_c, 1, 1)
                bn(f"{base}.0.1", exp)
                sd[f"{base}.1.0.weight"] = r(exp, 1, 3, 3)
                bn(f"{base}.1.1", exp)
                sd[f"{base}.2.weight"] = r(c, exp, 1, 1)
                bn(f"{base}.3", c)
            in_c = c
            feat += 1
    sd["features.18.0.weight"] = r(1280, 320, 1, 1)
    bn("features.18.1", 1280)
    sd["classifier.1.weight"] = r(1000, 1280)
    sd["classifier.1.bias"] = r(1000)
    return sd


@pytest.mark.parametrize("model_name", ["resnet", "mbnet"])
def test_imagenet_torchvision_conversion(model_name):
    from psla_tpu.models.convert import (
        convert_imagenet_mbnet,
        convert_imagenet_resnet,
    )

    rng = np.random.RandomState(5)
    model = create_model(model_name, label_dim=7)
    init_vars = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 128)), train=False
    )
    if model_name == "resnet":
        sd = _resnet50_imagenet_sd(rng)
        variables = convert_imagenet_resnet(sd, init_vars)
        stem_path = ("resnet", "stem", "conv", "kernel")
        probe = np.asarray(
            variables["batch_stats"]["resnet"]["layer3_2"]["conv2"]["bn"]["mean"]
        )
        np.testing.assert_allclose(probe, sd["layer3.2.bn2.running_mean"],
                                   rtol=1e-6)
    else:
        sd = _mobilenet_v2_imagenet_sd(rng)
        variables = convert_imagenet_mbnet(sd, init_vars)
        stem_path = ("stem", "conv", "kernel")
        probe = np.asarray(variables["batch_stats"]["head"]["bn"]["mean"])
        np.testing.assert_allclose(probe, sd["features.18.1.running_mean"],
                                   rtol=1e-6)
        # classifier stays fresh (the reference replaces it, Models.py:52)
        np.testing.assert_array_equal(
            np.asarray(variables["params"]["classifier"]["kernel"]),
            np.asarray(init_vars["params"]["classifier"]["kernel"]),
        )

    # exact init tree structure (drop-in with no key mismatch)
    ref_spec = {
        col: _tree_spec(jax.tree.map(np.asarray, dict(tree)))
        for col, tree in init_vars.items()
    }
    got_spec = {col: _tree_spec(tree) for col, tree in variables.items()}
    assert got_spec == ref_spec

    # stem stays fresh: the reference swaps in a 1-channel conv
    node_init, node_got = init_vars["params"], variables["params"]
    for k in stem_path:
        node_init, node_got = node_init[k], node_got[k]
    np.testing.assert_array_equal(np.asarray(node_got), np.asarray(node_init))

    out = model.apply(variables, jnp.ones((1, 128, 128)) * 0.1, train=False)
    assert out.shape == (1, 7) and np.all(np.isfinite(np.asarray(out)))
