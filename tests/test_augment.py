"""SpecAugment mask semantics (frontend/augment.py) vs torchaudio.

torchaudio.functional.mask_along_axis draws value ~ U(0, mask_param) and
min_value ~ U(0, size - value) as continuous numbers, then masks the
integer range [floor(min_value), floor(min_value) + floor(value)) —
masked widths are integers distributed as floor(U(0, mask_param)).
(Reference applies it via FrequencyMasking/TimeMasking transforms,
audioset_dataset.py:176-188.)
"""

import numpy as np
import jax
import jax.numpy as jnp

from psla_tpu.frontend.augment import _mask_axis, spec_augment


def _widths(param, size, n=2000):
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    masks = jax.vmap(lambda k: _mask_axis(k, size, param))(keys)
    return np.asarray((1.0 - masks).sum(axis=1))


def test_mask_widths_are_integers_with_floor_distribution():
    param, size = 48, 128
    w = _widths(param, size)
    np.testing.assert_array_equal(w, np.round(w))  # integer widths
    assert w.min() >= 0 and w.max() <= param - 1
    # floor(U(0, p)) has mean (p-1)/2 and P(width=0) = 1/p
    assert abs(w.mean() - (param - 1) / 2) < 1.5
    p0 = float((w == 0).mean())
    assert abs(p0 - 1 / param) < 0.02


def test_mask_is_single_contiguous_run_in_bounds():
    for seed in range(50):
        m = np.asarray(_mask_axis(jax.random.PRNGKey(seed), 64, 20))
        masked = np.flatnonzero(m == 0.0)
        if masked.size:
            assert masked[-1] - masked[0] + 1 == masked.size  # contiguous
            assert 0 <= masked[0] and masked[-1] < 64


def test_spec_augment_zero_params_is_identity():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 32, 16)))
    out = spec_augment(jax.random.PRNGKey(0), x, 0, 0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_spec_augment_masks_before_normalization_semantics():
    """Masked bins are exactly 0 (normalization shifts them afterwards,
    matching the reference's mask->normalize order)."""
    x = jnp.ones((4, 64, 32))
    out = np.asarray(spec_augment(jax.random.PRNGKey(3), x, 10, 10))
    assert set(np.unique(out)) <= {0.0, 1.0}
