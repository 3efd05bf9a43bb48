"""Offline-tools tests: label enhancement semantics on a toy ontology,
merge, threshold menu, prep resampler."""

import json

import numpy as np

from psla_tpu.tools.label_enhancement import (
    ancestor_map,
    check_label_cooccurrence,
    child_map,
    enhance_labels,
    merge_entries,
    parent_map,
    positive_score_thresholds,
    run_enhancement,
)

# Toy ontology: root -> {speech -> {male, female}, music}; 'abstract' skipped
ONTOLOGY = [
    {"id": "/m/root", "child_ids": ["/m/speech", "/m/music", "/m/abs"],
     "restrictions": []},
    {"id": "/m/speech", "child_ids": ["/m/male", "/m/female"], "restrictions": []},
    {"id": "/m/music", "child_ids": [], "restrictions": []},
    {"id": "/m/male", "child_ids": [], "restrictions": []},
    {"id": "/m/female", "child_ids": [], "restrictions": []},
    {"id": "/m/abs", "child_ids": ["/m/male"], "restrictions": ["abstract"]},
]

VOCAB = ["/m/speech", "/m/music", "/m/male", "/m/female"]
IDX = {m: i for i, m in enumerate(VOCAB)}


def test_child_and_parent_maps():
    c = child_map(ONTOLOGY)
    assert c["/m/speech"] == ["/m/male", "/m/female"]
    assert "/m/abs" not in c  # abstract skipped
    p = parent_map(ONTOLOGY)
    assert p["/m/male"] == ["/m/speech"]
    assert p["/m/speech"] == ["/m/root"]
    a = ancestor_map(ONTOLOGY)
    assert set(a["/m/male"]) == {"/m/speech", "/m/root"}


def test_threshold_menu():
    pred = np.array([[0.9, 0.1], [0.5, 0.2], [0.1, 0.9]])
    target = np.array([[1, 0], [1, 0], [0, 1]])
    thr = positive_score_thresholds(pred, target)
    assert abs(thr["mean"][0] - 0.7) < 1e-12
    assert abs(thr["median"][0] - 0.7) < 1e-12
    assert abs(thr["mean"][1] - 0.9) < 1e-12
    assert thr["5"][0] <= thr["25"][0] <= thr["median"][0]


def test_type1_adds_child_when_score_above_threshold():
    entries = [{"wav": "a.wav", "labels": "/m/speech"}]
    # male score 0.8 > thr 0.5 -> added; female 0.2 < 0.5 -> not
    pred = np.array([[0.9, 0.0, 0.8, 0.2]])
    thr = np.full(4, 0.5)
    out, added = enhance_labels(entries, pred, child_map(ONTOLOGY), IDX, thr)
    assert added == 1
    assert out[0]["labels"] == "/m/male,/m/speech"


def test_type2_adds_ancestor():
    entries = [{"wav": "a.wav", "labels": "/m/male"}]
    pred = np.array([[0.9, 0.0, 0.9, 0.0]])  # speech score high
    thr = np.full(4, 0.5)
    out, added = enhance_labels(entries, pred, ancestor_map(ONTOLOGY), IDX, thr)
    assert added == 1
    assert out[0]["labels"] == "/m/male,/m/speech"  # root not in vocab


def test_fsd_exclusion_list():
    entries = [{"wav": "a.wav", "labels": "/m/09l8g"}]
    rel = {"/m/09l8g": ["/m/male"]}
    pred = np.array([[0.9, 0.9, 0.9, 0.9]])
    thr = np.zeros(4)
    _, added_fsd = enhance_labels(entries, pred, rel, IDX, thr, dataset="fsd50k")
    _, added_as = enhance_labels(entries, pred, rel, IDX, thr, dataset="audioset")
    assert added_fsd == 0 and added_as == 1


def test_merge_union():
    a = [{"wav": "x", "labels": "/m/a,/m/b"}]
    b = [{"wav": "x", "labels": "/m/b,/m/c"}]
    assert merge_entries(a, b)[0]["labels"] == "/m/a,/m/b,/m/c"


def test_cooccurrence_counter():
    entries = [
        {"labels": "/m/male,/m/speech"},
        {"labels": "/m/male"},
        {"labels": "/m/music"},
    ]
    with_child, with_both = check_label_cooccurrence(
        entries, "/m/speech", ["/m/male", "/m/female"]
    )
    assert (with_child, with_both) == (2, 1)


def test_run_enhancement_end_to_end(tmp_path):
    datafile = tmp_path / "train.json"
    entries = [
        {"wav": "a.wav", "labels": "/m/speech"},
        {"wav": "b.wav", "labels": "/m/male"},
        {"wav": "c.wav", "labels": "/m/music"},
    ]
    datafile.write_text(json.dumps({"data": entries}))
    label_csv = tmp_path / "labels.csv"
    label_csv.write_text(
        "index,mid,display_name\n"
        + "".join(f"{i},{m},n{i}\n" for i, m in enumerate(VOCAB))
    )
    onto = tmp_path / "ontology.json"
    onto.write_text(json.dumps(ONTOLOGY))
    # candidate scores (a:male=0.95, b:speech=0.95) exceed the per-class
    # thresholds derived from positives (male thr<=0.9, speech thr<=0.9)
    pred = np.array(
        [[0.9, 0.05, 0.95, 0.1], [0.95, 0.05, 0.9, 0.1], [0.1, 0.9, 0.1, 0.1]]
    )
    target = np.array([[1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0]])
    np.savetxt(tmp_path / "pred.csv", pred, delimiter=",")
    np.savetxt(tmp_path / "target.csv", target, delimiter=",")

    written = run_enhancement(
        str(datafile), str(label_csv), str(onto),
        str(tmp_path / "pred.csv"), str(tmp_path / "target.csv"),
        threshold_kinds=("mean", "5"),
    )
    for kind in ("type1", "type2", "type1_2"):
        assert set(written[kind]) == {"mean", "5"}
    enhanced = json.loads(open(written["type1_2"]["5"]).read())["data"]
    # sample a (speech): male added via type1; sample b (male): speech via type2
    assert "/m/male" in enhanced[0]["labels"]
    assert "/m/speech" in enhanced[1]["labels"]
    # weight files were generated
    assert (tmp_path / "train_type1_mean_weight.csv").exists()


def test_ensemble_cli_main(tmp_path):
    """Drive the standalone ensemble CLI end-to-end on two tiny ckpts."""
    import orbax.checkpoint as ocp
    import jax
    import jax.numpy as jnp

    from psla_tpu.data.wav import write_wav
    from psla_tpu.models import create_model
    from psla_tpu.tools import ensemble as ens_tool

    label_csv = tmp_path / "labels.csv"
    label_csv.write_text("index,mid,display_name\n0,/m/0,a\n1,/m/1,b\n")
    entries = []
    rng = np.random.default_rng(0)
    for i in range(8):
        p = str(tmp_path / f"{i}.wav")
        write_wav(p, rng.standard_normal(8000) * 0.2, 16000)
        entries.append({"wav": p, "labels": "/m/0" if i % 2 else "/m/1"})
    df_path = tmp_path / "eval.json"
    df_path.write_text(json.dumps({"data": entries}))

    model = create_model("efficientnet", label_dim=2, eff_b=0, head_num=4)
    ckpts = []
    for s in range(2):
        v = model.init(jax.random.PRNGKey(s), jnp.zeros((1, 64, 128)), train=False)
        d = str(tmp_path / f"ckpt{s}")
        ocp.PyTreeCheckpointer().save(
            d, {"params": jax.tree.map(np.asarray, v["params"]),
                "batch_stats": jax.tree.map(np.asarray, v["batch_stats"])}
        )
        ckpts.append(d)

    rc = ens_tool.main(
        ckpts
        + ["--data-eval", str(df_path), "--label-csv", str(label_csv),
           "--eff_b", "0", "--n_class", "2", "--batch-size", "8",
           "--target_length", "64", "--out-dir", str(tmp_path / "preds")]
    )
    assert rc == 0
    assert (tmp_path / "preds" / "predictions_1.csv").exists()
    assert (tmp_path / "preds" / "target.csv").exists()


def test_ensemble_stacked_matches_sequential(tmp_path):
    """The stacked single-pass ensemble eval produces the same per-model
    predictions as E sequential full passes (reference semantics)."""
    import jax
    import jax.numpy as jnp

    from psla_tpu.config import ExperimentConfig
    from psla_tpu.data.loader import AudioLoader, LoaderConfig
    from psla_tpu.data.datafiles import load_datafile
    from psla_tpu.data.wav import write_wav
    from psla_tpu.models import create_model
    from psla_tpu.tools.ensemble import predict, predict_stacked

    label_csv = tmp_path / "labels.csv"
    label_csv.write_text("index,mid,display_name\n0,/m/0,a\n1,/m/1,b\n")
    entries = []
    rng = np.random.default_rng(1)
    for i in range(8):
        p = str(tmp_path / f"{i}.wav")
        write_wav(p, rng.standard_normal(8000) * 0.2, 16000)
        entries.append({"wav": p, "labels": "/m/0" if i % 2 else "/m/1"})
    df_path = tmp_path / "eval.json"
    df_path.write_text(json.dumps({"data": entries}))

    cfg = ExperimentConfig(n_class=2, eff_b=0, target_length=64, batch_size=8)
    pre = cfg.preprocess_config().eval_variant()
    model = create_model("efficientnet", label_dim=2, eff_b=0, head_num=4)
    variables = [
        jax.tree.map(
            np.asarray,
            model.init(jax.random.PRNGKey(s), jnp.zeros((1, 64, 128)), train=False),
        )
        for s in range(2)
    ]
    # zero-init heads make fresh members identical (all-0.5 probs); give
    # member 1 distinct weights so the cross-member assertion is meaningful
    pert = np.random.default_rng(7)
    variables[1]["params"] = jax.tree.map(
        lambda x: x + pert.normal(0, 0.02, x.shape).astype(x.dtype),
        variables[1]["params"],
    )
    df = load_datafile(str(df_path), str(label_csv))
    lc = LoaderConfig(
        batch_size=8,
        buffer_samples=pre.fbank.buffer_length(64),
        drop_remainder=False,
    )

    seq = [
        predict(model, v, AudioLoader(df, lc, shuffle=False), pre)[0]
        for v in variables
    ]
    stacked, target = predict_stacked(
        model, variables, AudioLoader(df, lc, shuffle=False), pre
    )
    assert stacked.shape == (2, 8, 2)
    assert target.shape == (8, 2)
    for i in range(2):
        np.testing.assert_allclose(stacked[i], seq[i], atol=2e-6)
    # the two members genuinely differ (different init seeds)
    assert np.abs(stacked[0] - stacked[1]).max() > 1e-4

    # vmapped path (members sharded over a 2-size 'ensemble' mesh axis)
    from jax.sharding import Mesh

    devs = np.asarray(jax.devices())
    if devs.size >= 4:
        mesh2 = Mesh(devs[:4].reshape(2, 2), ("ensemble", "data"))
        vm, _ = predict_stacked(
            model, variables, AudioLoader(df, lc, shuffle=False), pre, mesh2
        )
        for i in range(2):
            np.testing.assert_allclose(vm[i], seq[i], atol=2e-6)


def test_label_enhancement_cli_main(tmp_path):
    """Drive the offline enhancement CLI exactly as a user would."""
    from psla_tpu.tools import label_enhancement as le

    datafile = tmp_path / "train.json"
    datafile.write_text(
        json.dumps({"data": [
            {"wav": "a.wav", "labels": "/m/speech"},
            {"wav": "b.wav", "labels": "/m/male"},
        ]})
    )
    label_csv = tmp_path / "labels.csv"
    label_csv.write_text(
        "index,mid,display_name\n"
        + "".join(f"{i},{m},n{i}\n" for i, m in enumerate(VOCAB))
    )
    onto = tmp_path / "ontology.json"
    onto.write_text(json.dumps(ONTOLOGY))
    pred = np.array([[0.9, 0.05, 0.95, 0.1], [0.95, 0.05, 0.9, 0.1]])
    target = np.array([[1, 0, 0, 0], [0, 0, 1, 0]])
    np.savetxt(tmp_path / "pred.csv", pred, delimiter=",")
    np.savetxt(tmp_path / "target.csv", target, delimiter=",")

    rc = le.main([
        "--datafile", str(datafile), "--label-csv", str(label_csv),
        "--ontology", str(onto), "--pred", str(tmp_path / "pred.csv"),
        "--target", str(tmp_path / "target.csv"),
        "--thresholds", "mean", "--no-weights",
    ])
    assert rc == 0
    out = json.loads((tmp_path / "train_type1_2_mean.json").read_text())
    assert "/m/male" in out["data"][0]["labels"]


def test_weight_averaging_cli_main(tmp_path):
    import orbax.checkpoint as ocp
    import jax
    import jax.numpy as jnp

    from psla_tpu.data.wav import write_wav
    from psla_tpu.models import create_model
    from psla_tpu.tools import weight_averaging as wa

    label_csv = tmp_path / "labels.csv"
    label_csv.write_text("index,mid,display_name\n0,/m/0,a\n1,/m/1,b\n")
    entries = []
    rng = np.random.default_rng(0)
    for i in range(8):
        p = str(tmp_path / f"{i}.wav")
        write_wav(p, rng.standard_normal(8000) * 0.2, 16000)
        entries.append({"wav": p, "labels": "/m/0" if i % 2 else "/m/1"})
    (tmp_path / "eval.json").write_text(json.dumps({"data": entries}))

    model = create_model("efficientnet", label_dim=2, eff_b=0, head_num=4)
    ckpts = []
    for s in range(2):
        v = model.init(jax.random.PRNGKey(s), jnp.zeros((1, 64, 128)), train=False)
        d = str(tmp_path / f"ckpt{s}")
        ocp.PyTreeCheckpointer().save(
            d, {"params": jax.tree.map(np.asarray, v["params"]),
                "batch_stats": jax.tree.map(np.asarray, v["batch_stats"])}
        )
        ckpts.append(d)

    rc = wa.main(
        ckpts
        + ["--data-eval", str(tmp_path / "eval.json"),
           "--label-csv", str(label_csv), "--eff_b", "0", "--n_class", "2",
           "--batch-size", "8", "--target_length", "64"]
    )
    assert rc == 0


def test_label_enhancement_cli_modes(tmp_path, capsys):
    """--mode type1/merge/check select the reference's per-script behaviors."""
    from psla_tpu.tools import label_enhancement as le

    datafile = tmp_path / "train.json"
    datafile.write_text(
        json.dumps({"data": [
            {"wav": "a.wav", "labels": "/m/speech"},
            {"wav": "b.wav", "labels": "/m/male"},
        ]})
    )
    label_csv = tmp_path / "labels.csv"
    label_csv.write_text(
        "index,mid,display_name\n"
        + "".join(f"{i},{m},n{i}\n" for i, m in enumerate(VOCAB))
    )
    onto = tmp_path / "ontology.json"
    onto.write_text(json.dumps(ONTOLOGY))
    pred = np.array([[0.9, 0.05, 0.95, 0.1], [0.95, 0.05, 0.9, 0.1]])
    target = np.array([[1, 0, 0, 0], [0, 0, 1, 0]])
    np.savetxt(tmp_path / "pred.csv", pred, delimiter=",")
    np.savetxt(tmp_path / "target.csv", target, delimiter=",")
    common = [
        "--datafile", str(datafile), "--label-csv", str(label_csv),
        "--ontology", str(onto), "--pred", str(tmp_path / "pred.csv"),
        "--target", str(tmp_path / "target.csv"),
        "--thresholds", "mean", "--no-weights",
    ]

    assert le.main(["--mode", "type1"] + common) == 0
    assert (tmp_path / "train_type1_mean.json").exists()
    assert not (tmp_path / "train_type2_mean.json").exists()

    assert le.main(["--mode", "merge"] + common) == 0
    out = json.loads((tmp_path / "train_type1_2_mean.json").read_text())
    assert "/m/male" in out["data"][0]["labels"]
    # merge mode writes only the union file
    assert not (tmp_path / "train_type2_mean.json").exists()

    rc = le.main([
        "--mode", "check", "--datafile", str(datafile),
        "--ontology", str(onto), "--parent-mid", "/m/speech",
    ])
    assert rc == 0
    report = capsys.readouterr().out
    assert "1 samples carry a child of /m/speech" in report
