"""Frozen golden-fixture regression tests.

tests/goldens/kaldi_fbank.npz pins the kaldi fbank numerics to values
recorded on 2026-08-16 (from frontend/kaldi_numpy.py at that date). Unlike
the live-oracle tests (which compare two implementations computed at test
time and would drift together), these catch a regression in EITHER the
golden oracle or the fast paths.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from psla_tpu.frontend import kaldi_numpy as G
from psla_tpu.frontend.fbank import FbankConfig, fbank
from psla_tpu.frontend.fbank_pallas import fbank_pallas

GOLDEN = np.load(
    os.path.join(os.path.dirname(__file__), "goldens", "kaldi_fbank.npz")
)
CASES = ("noise", "quiet_short", "speechlike", "square100", "tone440")
CFG = FbankConfig()


def test_golden_has_provenance():
    """The npz must carry the 'source' array regenerate_goldens stamps
    (which oracle recorded it) and cover every grounding case."""
    assert "source" in GOLDEN.files, GOLDEN.files
    for name in CASES:
        assert f"wav_{name}" in GOLDEN.files, name
        assert f"fbank_{name}" in GOLDEN.files, name


@pytest.mark.parametrize("name", CASES)
def test_numpy_oracle_matches_recorded(name):
    got = G.fbank_numpy(GOLDEN[f"wav_{name}"])
    np.testing.assert_allclose(
        got, GOLDEN[f"fbank_{name}"], atol=1e-6, rtol=1e-6
    )


@pytest.mark.parametrize("name", CASES)
@pytest.mark.parametrize("method", ["fft", "gemm"])
def test_jax_paths_match_recorded(name, method):
    wav = GOLDEN[f"wav_{name}"]
    got = np.asarray(fbank(jnp.asarray(wav), config=CFG, method=method))
    np.testing.assert_allclose(
        got, GOLDEN[f"fbank_{name}"], atol=2e-4, rtol=1e-4
    )


@pytest.mark.parametrize("name", CASES)
def test_pallas_kernel_matches_recorded(name):
    wav = GOLDEN[f"wav_{name}"]
    ref = GOLDEN[f"fbank_{name}"]
    m = ref.shape[0]
    got = np.asarray(
        fbank_pallas(
            jnp.asarray(wav)[None],
            jnp.asarray([wav.size], jnp.int32),
            config=CFG,
            target_frames=m,
        )
    )[0]
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)
