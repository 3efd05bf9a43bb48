"""JAX kaldi-compatible log-mel filterbank, designed for TPU.

Replaces the CPU-worker call to ``torchaudio.compliance.kaldi.fbank``
(reference: src/dataloaders/audioset_dataset.py:119-120) with an on-device,
jit-compiled, batched transform. Two lowering strategies:

  * ``method='fft'``  — per-frame linear ops in the golden order, then
    ``jnp.fft.rfft``. Tightest numerical parity with kaldi/torchaudio.
  * ``method='gemm'`` — the whole per-frame chain (DC removal, preemphasis,
    window, real DFT) folded into ONE [window_size, 2*(nfft/2+1)] matrix so a
    batch of frames becomes a single MXU matmul:
        power = (F @ A_cos)^2 + (F @ A_sin)^2 ;  mel = power @ banks^T
    This is the shape the fused Pallas kernel (fbank_pallas.py) uses.

All math is float32; the mel matrix and DFT matrices are built in float64 on
host then cast, matching the golden (kaldi_numpy.py) construction.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from psla_tpu.frontend import kaldi_numpy as _ref

EPSILON = float(np.finfo(np.float32).eps)


@dataclasses.dataclass(frozen=True)
class FbankConfig:
    """Static fbank parameters (hashable: usable as a jit static arg).

    Defaults reproduce the PSLA reference call
    (src/dataloaders/audioset_dataset.py:119-120) plus kaldi defaults.
    """

    sample_frequency: float = 16000.0
    num_mel_bins: int = 128
    frame_length_ms: float = 25.0
    frame_shift_ms: float = 10.0
    window_type: str = "hanning"
    preemphasis_coefficient: float = 0.97
    remove_dc_offset: bool = True
    low_freq: float = 20.0
    high_freq: float = 0.0  # <=0 means nyquist + high_freq
    # MXU passes for the f32 DFT/mel matmuls: 'highest' (6-pass, ~1.1e-4 vs
    # golden), 'high' (3-pass), 'default' (single bf16 pass, ~1e-1 error —
    # do not use for parity work).
    precision: str = "highest"

    @property
    def matmul_precision(self):
        import jax

        return {
            "highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGH,
            "default": jax.lax.Precision.DEFAULT,
        }[self.precision]

    @property
    def window_size(self) -> int:
        return int(self.sample_frequency * self.frame_length_ms * 0.001)

    @property
    def window_shift(self) -> int:
        return int(self.sample_frequency * self.frame_shift_ms * 0.001)

    @property
    def padded_window_size(self) -> int:
        return _ref.next_power_of_2(self.window_size)

    @property
    def num_spectrum_bins(self) -> int:
        return self.padded_window_size // 2 + 1

    def num_frames(self, num_samples: int) -> int:
        if num_samples < self.window_size:
            return 0
        return 1 + (num_samples - self.window_size) // self.window_shift

    def buffer_length(self, num_frames: int) -> int:
        """Smallest sample count that yields exactly `num_frames` frames."""
        return (num_frames - 1) * self.window_shift + self.window_size


def num_frames(num_samples: int, config: FbankConfig = FbankConfig()) -> int:
    return config.num_frames(num_samples)


@functools.lru_cache(maxsize=None)
def mel_banks(config: FbankConfig = FbankConfig()) -> np.ndarray:
    """[num_mel_bins, num_spectrum_bins] kaldi triangular filterbank (f32)."""
    return _ref.mel_banks_numpy(
        config.num_mel_bins,
        config.padded_window_size,
        config.sample_frequency,
        config.low_freq,
        config.high_freq,
    )


@functools.lru_cache(maxsize=None)
def _window_np(config: FbankConfig) -> np.ndarray:
    return _ref._window(config.window_type, config.window_size)


@functools.lru_cache(maxsize=None)
def frontend_matrix(config: FbankConfig = FbankConfig()) -> np.ndarray:
    """Fold DC-removal + preemphasis + window + real DFT into one matrix.

    Returns A of shape [window_size, 2 * num_spectrum_bins] (f32) such that
    for a raw frame f (length window_size):
        y = f @ A ;  power[k] = y[k]^2 + y[k + num_spectrum_bins]^2
    equals the kaldi power spectrum of the processed frame.
    """
    ws = config.window_size
    nfft = config.padded_window_size
    nbins = config.num_spectrum_bins

    chain = np.eye(ws, dtype=np.float64)
    if config.remove_dc_offset:
        chain = chain - np.full((ws, ws), 1.0 / ws)
    c = config.preemphasis_coefficient
    if c != 0.0:
        pre = np.eye(ws) * (1.0)
        for i in range(1, ws):
            pre[i, i - 1] = -c
        pre[0, 0] = 1.0 - c
        chain = pre @ chain
    chain = np.diag(_window_np(config).astype(np.float64)) @ chain

    n = np.arange(ws, dtype=np.float64)
    k = np.arange(nbins, dtype=np.float64)[:, None]
    ang = 2.0 * np.pi * k * n[None, :] / nfft
    dft_cos = np.cos(ang)
    dft_sin = -np.sin(ang)

    a = np.concatenate([dft_cos @ chain, dft_sin @ chain], axis=0)  # [2*nbins, ws]
    return np.ascontiguousarray(a.T, dtype=np.float32)


def frame_signal(wav: jax.Array, config: FbankConfig) -> jax.Array:
    """[..., N] -> [..., M, window_size] via snip-edges strided framing."""
    m = config.num_frames(wav.shape[-1])
    starts = jnp.arange(m) * config.window_shift
    idx = starts[:, None] + jnp.arange(config.window_size)[None, :]
    return wav[..., idx]


def _power_spectrum_fft(frames: jax.Array, config: FbankConfig) -> jax.Array:
    """Golden-ordered per-frame ops + rFFT. frames: [..., M, window_size]."""
    x = frames
    if config.remove_dc_offset:
        x = x - jnp.mean(x, axis=-1, keepdims=True)
    c = config.preemphasis_coefficient
    if c != 0.0:
        prev = jnp.concatenate([x[..., :1], x[..., :-1]], axis=-1)
        x = x - jnp.float32(c) * prev
    x = x * jnp.asarray(_window_np(config))
    spec = jnp.fft.rfft(x, n=config.padded_window_size)
    return jnp.real(spec) ** 2 + jnp.imag(spec) ** 2


def _power_spectrum_gemm(frames: jax.Array, config: FbankConfig) -> jax.Array:
    # HIGHEST: TPU's default f32 matmul precision (bf16 passes) costs ~1e-1
    # absolute error in the log-mel domain; full f32 keeps parity at ~1e-4.
    a = jnp.asarray(frontend_matrix(config))
    y = jnp.einsum(
        "...tw,wk->...tk",
        frames,
        a,
        preferred_element_type=jnp.float32,
        precision=config.matmul_precision,
    )
    nbins = config.num_spectrum_bins
    return y[..., :nbins] ** 2 + y[..., nbins:] ** 2


@functools.partial(jax.jit, static_argnames=("config", "method"))
def fbank(
    wav: jax.Array,
    config: FbankConfig = FbankConfig(),
    method: str = "fft",
) -> jax.Array:
    """Log-mel fbank of waveform(s). [..., N] -> [..., M, num_mel_bins] f32."""
    wav = wav.astype(jnp.float32)
    frames = frame_signal(wav, config)
    if method == "fft":
        power = _power_spectrum_fft(frames, config)
    elif method == "gemm":
        power = _power_spectrum_gemm(frames, config)
    else:
        raise ValueError(f"unknown method {method!r}")
    banks = jnp.asarray(mel_banks(config))
    mel = jnp.einsum(
        "...tk,mk->...tm",
        power,
        banks,
        preferred_element_type=jnp.float32,
        precision=config.matmul_precision,
    )
    return jnp.log(jnp.maximum(mel, EPSILON))


@functools.partial(jax.jit, static_argnames=("config", "method"))
def fbank_batched(
    wav: jax.Array,
    lengths: jax.Array | None = None,
    config: FbankConfig = FbankConfig(),
    method: str = "fft",
) -> tuple[jax.Array, jax.Array]:
    """Batched fbank over fixed-size waveform buffers with true lengths.

    Args:
      wav: [B, N] zero-padded waveform buffers (already DC-handled upstream
        if lengths are used — see pipeline.py).
      lengths: [B] int32 true sample counts, or None if all buffers are full.

    Returns:
      (logmel [B, M, num_mel_bins], frame_valid [B, M] bool). Frames at or
      beyond a sample's true frame count are zeroed, reproducing the
      reference's zero-padding of short clips in the *log-mel* domain
      (src/dataloaders/audioset_dataset.py:125-132).
    """
    logmel = fbank(wav, config=config, method=method)
    m = logmel.shape[-2]
    if lengths is None:
        valid = jnp.ones(logmel.shape[:-1], dtype=bool)
        return logmel, valid
    n_valid = jnp.where(
        lengths >= config.window_size,
        1 + (lengths - config.window_size) // config.window_shift,
        0,
    )
    valid = jnp.arange(m)[None, :] < n_valid[:, None]
    logmel = jnp.where(valid[..., None], logmel, 0.0)
    return logmel, valid
