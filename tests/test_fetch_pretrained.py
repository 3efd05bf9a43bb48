"""Model-zoo fetch+convert tool (pretrained_models/README.md surface).

Network is unavailable here, so the download+convert plumbing is driven
through a file:// URL with a reference-layout state_dict — the same code
path a real Dropbox URL takes.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from psla_tpu.tools.fetch_pretrained import ZOO, fetch_and_convert, main  # noqa: E402
from tests.test_convert import _effnet_state_dict  # noqa: E402


def test_zoo_listing(capsys):
    assert main(["--list"]) == 0
    out = capsys.readouterr().out
    assert "as_mdl_0" in out and "0.440" in out


def test_unknown_name_raises(tmp_path):
    with pytest.raises(KeyError, match="as_mdl_0"):
        fetch_and_convert("nope", str(tmp_path))


def test_fetch_and_convert_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    sd = _effnet_state_dict(0, 527, 4, rng)
    src = tmp_path / "src.pth"
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               str(src))

    out = tmp_path / "zoo"
    ckpt = fetch_and_convert("as_mdl_0", str(out), url=f"file://{src}")
    assert os.path.isdir(ckpt)
    assert not os.path.exists(out / "as_mdl_0.pth")  # cleaned by default

    import orbax.checkpoint as ocp

    tree = ocp.PyTreeCheckpointer().restore(ckpt)
    assert tree["params"]["attention"]["head_weight"].shape == (4,)
    # fc keys dropped like the reference's ensemble tooling
    assert "_fc" not in str(sorted(tree["params"]["effnet"].keys()))


def test_zoo_urls_wellformed():
    for name, e in ZOO.items():
        assert e["url"].startswith("https://www.dropbox.com/")
        assert e["url"].endswith("?dl=1")
        assert e["n_class"] in (527, 200)
