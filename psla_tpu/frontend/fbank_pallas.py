"""Fused Pallas TPU kernel: batched waveforms -> kaldi log-mel fbank.

This is the hand-scheduled version of the GEMM-DFT lowering in fbank.py
(replacing the reference's CPU-worker ``torchaudio.compliance.kaldi.fbank``
call, src/dataloaders/audioset_dataset.py:119-120). The XLA path
materializes the strided frame matrix ``[B, M, window_size]`` in HBM (a
2.5x expansion of the waveform at 25 ms / 10 ms framing) plus the power
spectrum ``[B, M, 2*(nfft/2+1)]``; this kernel streams 160-sample waveform
rows HBM->VMEM by DMA and keeps frames, power spectrum and mel energies
entirely in VMEM, writing only the final ``[B, target_frames, n_mels]``
log-mel block back to HBM.

Key trick — no frame assembly at all. With window_size 400 and shift 160,
frame ``i`` is the concatenation of waveform *rows* (length-160 chunks)
``r[i], r[i+1], r[i+2][:80]``. So instead of gathering overlapping frames,
view the waveform as rows ``[R, 160]`` and row-split the fused
DC-removal+preemphasis+window+DFT matrix A ``[window, 2*nbins]`` (see
fbank.frontend_matrix) into per-part matrices ``A_a [shift, 2*nbins]``:

    y[i, :] = sum_a  r[i + a] @ A_a          (a = 0 .. ceil(window/shift)-1)

i.e. three MXU matmuls over sublane-shifted views of the same VMEM buffer.
``power = y_cos^2 + y_sin^2``; ``mel = power @ banks^T``; ``log``; frames at
or beyond the clip's true frame count are zeroed (the reference zero-pads
short clips in the log-mel domain, src/dataloaders/audioset_dataset.py:
125-132). Cos/sin columns are padded to lane multiples of 128 so every
slice in the kernel is lane-aligned; zero-padded bank rows make the padding
lanes inert.

Numerics match ``fbank.fbank(method='gemm')`` up to f32 summation order
(the kernel accumulates the window in ``ceil(window/shift)`` partial
matmuls).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from psla_tpu.frontend.fbank import EPSILON, FbankConfig, frontend_matrix, mel_banks

# Frame-tile size: sublane-aligned (mult of 8), divides 1056 exactly and
# keeps VMEM under ~4 MB at 128 mel bins.
_DEFAULT_TILE = 264


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.lru_cache(maxsize=None)
def _split_matrices(config: FbankConfig) -> tuple[np.ndarray, ...]:
    """Row-split + lane-pad the fused frontend matrix and mel banks.

    Returns (a_parts [n_parts, row_w, 2*PB], banks_p [PB, n_mels_padded])
    where PB = nbins rounded up to 128 lanes and row_w = shift rounded up to
    128 (Mosaic DMA slices must be lane-aligned; the padding rows of A are
    zero so the padded waveform lanes are inert).
    """
    ws, sh = config.window_size, config.window_shift
    nbins = config.num_spectrum_bins
    pb = _round_up(nbins, 128)
    row_w = _round_up(sh, 128)
    n_parts = -(-ws // sh)

    a = frontend_matrix(config)  # [ws, 2*nbins] f32: [:, :nbins]=cos, rest sin
    parts = np.zeros((n_parts, row_w, 2 * pb), dtype=np.float32)
    for p in range(n_parts):
        lo, hi = p * sh, min((p + 1) * sh, ws)
        parts[p, : hi - lo, :nbins] = a[lo:hi, :nbins]
        parts[p, : hi - lo, pb : pb + nbins] = a[lo:hi, nbins:]

    banks = mel_banks(config)  # [n_mels, nbins]
    nm = _round_up(banks.shape[0], 128)
    banks_p = np.zeros((pb, nm), dtype=np.float32)
    banks_p[:nbins, : banks.shape[0]] = banks.T
    return parts, banks_p


def _fbank_kernel(
    nvalid_ref,  # SMEM [B] int32 (scalar prefetch)
    wav_ref,  # HBM  [B, R, row_w] f32 lane-padded waveform rows
    a_ref,  # VMEM [n_parts, row_w, 2*PB] f32
    banks_ref,  # VMEM [PB, NM] f32
    out_ref,  # VMEM [1, TM, NM] f32 block
    rows_ref,  # VMEM scratch [TM + slack, row_w]
    sem,  # DMA semaphore
    *,
    tile: int,
    n_parts: int,
    pb: int,
    slack: int,
    precision,
):
    b = pl.program_id(0)
    t = pl.program_id(1)
    base = t * tile

    # One sublane-aligned DMA per tile (base is a multiple of 8); the
    # per-part frame shifts are static sublane slices of the VMEM buffer.
    copy = pltpu.make_async_copy(
        wav_ref.at[b, pl.ds(base, tile + slack), :], rows_ref, sem
    )
    copy.start()
    copy.wait()

    def mm(x, w):
        """f32 matmul at the configured cost/accuracy point.

        'highest': Mosaic's 6-pass full-f32 MXU product (~1.1e-4 log-mel
        parity). 'x3': bf16x3 split-product — x = hi(x)+lo(x), w =
        hi(w)+lo(w), dropping the lo*lo term: three single-pass bf16
        matmuls for ~f32-grade accuracy at half the HIGHEST cost (Mosaic
        has no native 3-pass HIGH dot).
        """
        if precision == "x3":
            xh = x.astype(jnp.bfloat16)
            xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
            wh = w.astype(jnp.bfloat16)
            wl = (w - wh.astype(jnp.float32)).astype(jnp.bfloat16)
            dot = functools.partial(
                jnp.dot, preferred_element_type=jnp.float32
            )
            return dot(xh, wh) + (dot(xh, wl) + dot(xl, wh))
        return jnp.dot(
            x, w, preferred_element_type=jnp.float32, precision=precision
        )

    y = mm(rows_ref[0:tile], a_ref[0])
    for p in range(1, n_parts):
        y = y + mm(rows_ref[p : p + tile], a_ref[p])
    power = y[:, :pb] ** 2 + y[:, pb:] ** 2
    mel = mm(power, banks_ref[:])
    logmel = jnp.log(jnp.maximum(mel, EPSILON))

    frame_idx = base + jax.lax.broadcasted_iota(jnp.int32, logmel.shape, 0)
    out_ref[0] = jnp.where(frame_idx < nvalid_ref[b], logmel, 0.0)


@functools.partial(
    jax.jit, static_argnames=("config", "target_frames", "tile", "interpret")
)
def fbank_pallas(
    wav: jax.Array,
    lengths: jax.Array | None = None,
    config: FbankConfig = FbankConfig(),
    target_frames: int = 1056,
    tile: int | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """Fused log-mel fbank: [B, N] waveforms -> [B, target_frames, n_mels].

    Pads or truncates the time axis to ``target_frames`` on the fly
    (audioset_dataset.py:125-132 semantics: zero padding in the log-mel
    domain). ``lengths`` gives each buffer's true sample count; frames that
    would read past it are zeroed.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    sh = config.window_shift
    ws = config.window_size
    n_parts = -(-ws // sh)
    if tile is None:
        tile = _DEFAULT_TILE if target_frames % _DEFAULT_TILE == 0 else 256
    n_tiles = -(-target_frames // tile)

    b, n = wav.shape
    # Rows needed so every tile's [base, base + tile + slack) DMA is in
    # bounds; slack rounds the (n_parts - 1)-row overlap up to the sublane
    # tile (8) so DMA sizes stay aligned.
    slack = _round_up(n_parts - 1, 8)
    r = n_tiles * tile + slack
    need = r * sh
    wav = wav.astype(jnp.float32)
    wav = wav[:, :need] if n >= need else jnp.pad(wav, ((0, 0), (0, need - n)))
    row_w = _round_up(sh, 128)
    rows = jnp.pad(wav.reshape(b, r, sh), ((0, 0), (0, 0), (0, row_w - sh)))

    if lengths is None:
        n_valid = jnp.full((b,), config.num_frames(min(n, need)), jnp.int32)
    else:
        lengths = jnp.minimum(lengths, min(n, need))
        n_valid = jnp.where(
            lengths >= ws, 1 + (lengths - ws) // sh, 0
        ).astype(jnp.int32)
    n_valid = jnp.minimum(n_valid, target_frames)

    a_parts, banks_p = _split_matrices(config)
    pb = banks_p.shape[0]
    nm_p = banks_p.shape[1]

    precision = config.matmul_precision
    if precision == jax.lax.Precision.HIGH:
        # Mosaic has no 3-pass HIGH dot; use the explicit bf16x3 split.
        precision = "x3"
    kernel = functools.partial(
        _fbank_kernel, tile=tile, n_parts=n_parts, pb=pb, slack=slack,
        precision=precision,
    )
    a_parts = jnp.asarray(a_parts)
    banks_p = jnp.asarray(banks_p)

    def call(nv, rw, ap, bp):
        bl = rw.shape[0]  # per-shard batch when wrapped in shard_map below
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bl, n_tiles),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(
                    ap.shape, lambda i, j, n: (0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    bp.shape, lambda i, j, n: (0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, tile, nm_p), lambda i, j, n: (i, j, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((tile + slack, row_w), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
        )
        # under jax.shard_map (the ensemble axis / the data wrap below)
        # pallas outputs must declare which manual mesh axes they vary
        # over; propagate the union of the inputs' vma sets (empty
        # outside shard_map, so this is a no-op there)
        try:
            vma = frozenset().union(*(jax.typeof(x).vma for x in (nv, rw, ap, bp)))
            out_aval = jax.ShapeDtypeStruct(
                (bl, n_tiles * tile, nm_p), jnp.float32, vma=vma
            )
        except (AttributeError, TypeError):  # older jax: no vma tracking
            out_aval = jax.ShapeDtypeStruct(
                (bl, n_tiles * tile, nm_p), jnp.float32
            )
        return pl.pallas_call(
            kernel, out_shape=out_aval, grid_spec=grid_spec,
            interpret=interpret,
        )(nv, rw, ap, bp)

    # Mosaic kernels cannot be partitioned by GSPMD. When tracing under a
    # mesh with Auto (compiler-managed) axes — the 'data' axis inside the
    # partial-manual ensemble shard_map (parallel/ensemble.py), or a plain
    # multi-chip DP step under jax.sharding.set_mesh — wrap the kernel in
    # a nested shard_map that makes those axes manual and shards the batch
    # dim, so each device runs the kernel on its own batch shard. fbank is
    # per-sample, so this is numerics-preserving by construction.
    wrap = _wrap_decision(b, _ambient_auto_axes(), interpret)
    if wrap:
        mesh_ctx, auto = wrap
        from jax.sharding import PartitionSpec as P

        batch_spec = P(auto)
        # check_vma=False: the kernel body mixes refs with differing
        # vma sets (scalar-prefetch + HBM refs), which trips the vma
        # consistency check in interpret mode; there are no
        # collectives inside, so the check buys nothing here.
        call = jax.shard_map(
            call, mesh=mesh_ctx, axis_names=frozenset(auto),
            in_specs=(batch_spec, batch_spec, P(), P()),
            out_specs=batch_spec, check_vma=False,
        )
    out = call(n_valid, rows, a_parts, banks_p)
    return out[:, :target_frames, : config.num_mel_bins]


def _wrap_decision(b: int, auto_axes, interpret: bool):
    """Whether (and over which mesh/axes) to shard_map-wrap the kernel.

    Must return the wrap even when the auto axes have ONE total shard:
    under an active mesh context GSPMD refuses Mosaic kernels outright
    ("cannot be automatically partitioned"), regardless of whether any
    partitioning is needed — regression caught on-chip when a shards>1
    guard broke 1-chip ensemble training. The single-chip hot path avoids
    the wrap cost by never entering a mesh context at all
    (train/step.py:with_mesh_context skips 1-device meshes)."""
    if not auto_axes:
        return None
    mesh_ctx, auto = auto_axes
    shards = int(np.prod([mesh_ctx.shape[a] for a in auto]))
    if b % shards != 0:
        # Indivisible batches can only fall through unwrapped in interpret
        # mode (CPU tests — interpreted pallas is ordinary XLA, GSPMD
        # handles it). On a real chip Mosaic would refuse the unwrapped
        # kernel with an opaque 'cannot be automatically partitioned'
        # error far from the cause, so fail loudly here instead.
        if not interpret:
            raise ValueError(
                f"fbank_pallas: batch {b} is not divisible by the mesh's "
                f"{shards} auto-axis shard(s) ({auto}); pad the device "
                "batch to a multiple of the data-axis size (shard_batch "
                "does this for loader batches)"
            )
        return None
    return (mesh_ctx, auto)


def _ambient_auto_axes():
    """The ambient abstract mesh and its Auto (GSPMD-managed) axis names,
    or None when there is no mesh context / no Auto axes / an old jax."""
    try:
        am = jax.sharding.get_abstract_mesh()
        if am is None or am.empty:
            return None
        auto = tuple(
            n for n, t in zip(am.axis_names, am.axis_types)
            if t == jax.sharding.AxisType.Auto
        )
    except (AttributeError, TypeError):
        return None
    return (am, auto) if auto else None
