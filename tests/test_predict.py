"""End-to-end test of the one-click prediction CLI (tools/predict.py)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import orbax.checkpoint as ocp

from psla_tpu.data.wav import write_wav
from psla_tpu.models import create_model
from psla_tpu.tools import predict


def test_predict_cli_end_to_end(tmp_path, capsys):
    label_csv = tmp_path / "labels.csv"
    label_csv.write_text(
        "index,mid,display_name\n0,/m/0,Dog\n1,/m/1,Cat\n2,/m/2,Rain\n"
    )
    model = create_model("efficientnet", label_dim=3, eff_b=0, head_num=4)
    target = 64
    example = jnp.zeros((1, target, 128), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), example, train=False)
    ckpt_dir = str(tmp_path / "ckpt")
    ocp.PyTreeCheckpointer().save(
        ckpt_dir,
        {
            "params": jax.tree.map(np.asarray, variables["params"]),
            "batch_stats": jax.tree.map(np.asarray, variables["batch_stats"]),
        },
    )

    rng = np.random.default_rng(0)
    wav_path = str(tmp_path / "clip.wav")
    # 8 kHz source exercises the resampling path; ~1.7 chunks at target 64
    write_wav(wav_path, rng.standard_normal(60_000) * 0.2, 8000)

    rc = predict.main(
        [
            wav_path,
            "--ckpt", ckpt_dir,
            "--label-csv", str(label_csv),
            "--eff_b", "0",
            "--target_length", str(target),
            "--top_k", "2",
            "--chunk_batch", "2",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "clip.wav" in out
    # top-2 rows with a probability and a display name
    lines = [l for l in out.splitlines() if l.startswith("  ")]
    assert len(lines) == 2
    assert any(n in out for n in ("Dog", "Cat", "Rain"))
