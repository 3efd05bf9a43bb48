"""Fused eval-mode MBConv block as a Pallas TPU kernel.

Why: the train/eval profile (PERF.md) shows EfficientNet at audio
resolutions is HBM-bound on the 6x-EXPANDED MBConv intermediates (e.g.
bf16[128,64,528,96]). XLA materializes the expanded tensor twice per block
(post-expand and post-depthwise). This kernel computes an ENTIRE block —
expand 1x1 -> BN -> swish -> depthwise kxk -> BN -> swish ->
squeeze-excite -> project 1x1 -> BN (+ residual) — with the expanded
tensors living only in VMEM; HBM sees just the block input and output.

Eval mode only: BN folds to a per-channel affine absorbed into the conv
weights (fold_block_params). Training-mode BN needs cross-batch statistics
between the convs, which forces materialization — that is the next-round
project.

STATUS: numerically exact (tests/test_fused_mbconv.py) but currently
SLOWER than XLA's eval forward on v5e (measured 0.07x at B=32 on a
stage-1-shaped block). Measurement shows XLA's eval block already sits at
the HBM roofline (~1.3 ms for ~1 GB of intermediate traffic), while this
kernel pays per-grid-step serial DMA and Mosaic relayout copies for the
k*k sublane-shifted views of the expanded tensor. Kept as the correctness
foundation for the training-mode fused block (where XLA is far from the
roofline, PERF.md); NOT wired into the default eval path.

Design (flattened spatial rows):
  * The feature map [H, W, C] is flattened to rows [H*W, C]: every conv
    becomes a clean 2-D MXU matmul, and the depthwise kxk becomes k*k
    shifted multiply-adds with row offsets dh*W + dw on a haloed row
    window — lane-aligned, no gathers. Row-validity masks (computed from a
    broadcasted iota) reproduce SAME zero-padding exactly at the H/W edges
    and at the clip boundary.
  * Squeeze-excite needs a global spatial mean BEFORE gating, so the block
    runs in TWO grid passes sharing one recompute-style structure:
    pass 1 accumulates the per-channel sum of the post-depthwise
    activations (revisited output block per batch element); the tiny SE
    MLP runs between passes in XLA; pass 2 recomputes expand+depthwise
    (VMEM-cheap), applies the gate, projects, and adds the residual.
    Recomputing beats materializing: the expanded tensor never leaves
    VMEM.
  * Stride-1 blocks only (the majority); stride-2 blocks fall back to XLA
    (models/eval_fast.py orchestrates).

Reference semantics: efficientnet_pytorch MBConvBlock.forward as used by
PSLA (src/models/Models.py:69-72,109); parity is tested against the flax
EfficientNet eval forward.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pad_lanes(a, axis: int):
    """Zero-pad `axis` up to a multiple of 128 (jit-traceable)."""
    a = jnp.asarray(a, jnp.float32)
    p = _round_up(a.shape[axis], 128) - a.shape[axis]
    if p == 0:
        return a
    pads = [(0, 0)] * a.ndim
    pads[axis] = (0, p)
    return jnp.pad(a, pads)


def _bn_affine(bn_params, bn_stats, eps=1e-3):
    scale = np.asarray(bn_params["scale"], np.float64)
    bias = np.asarray(bn_params["bias"], np.float64)
    mean = np.asarray(bn_stats["mean"], np.float64)
    var = np.asarray(bn_stats["var"], np.float64)
    s = scale / np.sqrt(var + eps)
    return s, bias - mean * s


def fold_block_params(block_params: dict, block_stats: dict) -> dict:
    """flax MBConvBlock params+batch_stats -> BN-folded kernel weights.

    Layout matches models/efficientnet.py MBConvBlock: submodules
    expand/depthwise/project (ConvBN: conv+bn) and se_reduce/se_expand
    (bias convs)."""
    out = {}
    if "expand" in block_params:
        s, b = _bn_affine(
            block_params["expand"]["bn"], block_stats["expand"]["bn"]
        )
        w = np.asarray(block_params["expand"]["conv"]["kernel"], np.float64)
        out["w1"] = (w[0, 0] * s[None, :]).astype(np.float32)  # [Cin, Ce]
        out["b1"] = b.astype(np.float32)
    s, b = _bn_affine(
        block_params["depthwise"]["bn"], block_stats["depthwise"]["bn"]
    )
    wd = np.asarray(block_params["depthwise"]["conv"]["kernel"], np.float64)
    k = wd.shape[0]
    out["wd"] = (wd.reshape(k * k, -1) * s[None, :]).astype(np.float32)
    out["bd"] = b.astype(np.float32)
    out["wr"] = np.asarray(
        block_params["se_reduce"]["kernel"], np.float32
    )[0, 0]
    out["br"] = np.asarray(block_params["se_reduce"]["bias"], np.float32)
    out["we"] = np.asarray(
        block_params["se_expand"]["kernel"], np.float32
    )[0, 0]
    out["be"] = np.asarray(block_params["se_expand"]["bias"], np.float32)
    s, b = _bn_affine(
        block_params["project"]["bn"], block_stats["project"]["bn"]
    )
    wp = np.asarray(block_params["project"]["conv"]["kernel"], np.float64)
    out["wp"] = (wp[0, 0] * s[None, :]).astype(np.float32)  # [Ce, Cout]
    out["bp"] = b.astype(np.float32)
    return out


def _dot(a, w, fast: bool):
    if fast:
        return jnp.dot(
            a.astype(jnp.bfloat16),
            w.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    return jnp.dot(
        a, w, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _expand_depthwise(
    chunk, w1_ref, b1_ref, wd_ref, bd_ref, g0, *,
    tile, hl, offsets, width, hw, fast, has_expand,
):
    """Shared pass body: chunk [tile+2*HL, Cinp] -> post-dw swish [tile, Cep].

    g0 is the first central row's global index. offsets is the static list
    of (row_offset, dw) for the k*k taps.

    Masking strategy: e is zeroed at rows outside [0, hw) ONCE (so taps
    reading past the clip boundary contribute exact SAME zero padding —
    including the swish(bias) the padding rows would otherwise carry), and
    the W-edge wraparound of the flattened layout is handled by 2m+1
    per-target column masks shared across the dh taps. Tap math runs in
    the activation dtype (bf16 in fast mode) on the VPU.
    """
    # global index of every row in the chunk (centre rows at offset hl)
    src_gidx = (g0 - hl) + jax.lax.broadcasted_iota(
        jnp.int32, (chunk.shape[0], 1), 0
    )
    if has_expand:
        e = jax.nn.swish(_dot(chunk, w1_ref[...], fast) + b1_ref[...])
    else:
        e = chunk
    act_dtype = jnp.bfloat16 if fast else jnp.float32
    row_ok = ((src_gidx >= 0) & (src_gidx < hw)).astype(act_dtype)
    e = e.astype(act_dtype) * row_ok

    gidx = g0 + jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
    col = jax.lax.rem(gidx, width)
    # group taps by dw: one column mask per dw, shared across dh
    by_dw = {}
    for j, (off, dw) in enumerate(offsets):
        by_dw.setdefault(dw, []).append((j, off))
    acc = jnp.zeros((tile, e.shape[-1]), jnp.float32)
    for dw, taps in by_dw.items():
        cj = col + dw
        cmask = ((cj >= 0) & (cj < width)).astype(act_dtype)
        part = jnp.zeros((tile, e.shape[-1]), jnp.float32)
        for j, off in taps:
            part = part + (
                e[hl + off : hl + off + tile]
                * wd_ref[j][None, :].astype(act_dtype)
            ).astype(jnp.float32)
        acc = acc + part * cmask.astype(jnp.float32)
    return jax.nn.swish(acc + bd_ref[...]), gidx


def _pass1_kernel(
    x_ref, w1_ref, b1_ref, wd_ref, bd_ref, se_ref, xs_ref, sem, *,
    tile, hl, offsets, width, hw, fast, has_expand, cinp,
):
    b = pl.program_id(0)
    t = pl.program_id(1)
    copy = pltpu.make_async_copy(
        x_ref.at[b, pl.ds(t * tile, tile + 2 * hl), :], xs_ref, sem
    )
    copy.start()
    copy.wait()
    d, gidx = _expand_depthwise(
        xs_ref[...], w1_ref, b1_ref, wd_ref, bd_ref, t * tile,
        tile=tile, hl=hl, offsets=offsets, width=width, hw=hw, fast=fast,
        has_expand=has_expand,
    )
    valid = (gidx < hw).astype(jnp.float32)
    part = jnp.sum(d * valid, axis=0, keepdims=True)  # [1, Cep]

    @pl.when(t == 0)
    def _():
        se_ref[...] = jnp.zeros_like(se_ref)

    # block is [1, 8, Cep] (sublane-aligned); row 0 carries the sum
    se_ref[0, 0:1, :] += part


def _pass2_kernel(
    x_ref, w1_ref, b1_ref, wd_ref, bd_ref, gate_ref, wp_ref, bp_ref,
    out_ref, xs_ref, sem, *,
    tile, hl, offsets, width, hw, fast, has_expand, skip, cout_p,
):
    b = pl.program_id(0)
    t = pl.program_id(1)
    copy = pltpu.make_async_copy(
        x_ref.at[b, pl.ds(t * tile, tile + 2 * hl), :], xs_ref, sem
    )
    copy.start()
    copy.wait()
    d, _ = _expand_depthwise(
        xs_ref[...], w1_ref, b1_ref, wd_ref, bd_ref, t * tile,
        tile=tile, hl=hl, offsets=offsets, width=width, hw=hw, fast=fast,
        has_expand=has_expand,
    )
    g = d * gate_ref[0, 0:1, :]
    p = _dot(g, wp_ref[...], fast) + bp_ref[...]
    if skip:
        p = p + xs_ref[hl : hl + tile, :cout_p]
    out_ref[0] = p


def fused_mbconv_eval(
    x: jax.Array,
    folded: dict,
    kernel: int,
    fast: bool = True,
    tile: int = 2048,
    interpret: bool | None = None,
) -> jax.Array:
    """One stride-1 MBConv block, eval mode. x: [B, H, W, Cin] -> [B, H, W, Cout]."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, w, cin = x.shape
    hw = h * w
    m = kernel // 2
    halo = m * w + m
    hl = _round_up(halo, 8)
    has_expand = "w1" in folded
    ce = folded["wd"].shape[1]
    cout = folded["wp"].shape[1]
    skip = cin == cout

    tile = min(tile, _round_up(hw, 8))
    n_tiles = -(-hw // tile)

    x_flat = x.reshape(b, hw, cin).astype(jnp.float32)
    rows_pad = n_tiles * tile + 2 * hl
    cinp = _round_up(cin, 128)
    x_pad = jnp.pad(
        x_flat, ((0, 0), (hl, rows_pad - hw - hl), (0, cinp - cin))
    )

    offsets = [
        (dh * w + dw, dw)
        for dh in range(-m, m + 1)
        for dw in range(-m, m + 1)
    ]

    w1 = _pad_lanes(_pad_lanes(folded["w1"], 1), 0) if has_expand else None
    b1 = _pad_lanes(folded["b1"][None, :], 1) if has_expand else None
    wd = _pad_lanes(folded["wd"], 1)
    bd = _pad_lanes(folded["bd"][None, :], 1)
    wp = _pad_lanes(_pad_lanes(folded["wp"], 1), 0)
    bp = _pad_lanes(folded["bp"][None, :], 1)
    cep = wd.shape[1]
    cout_p = wp.shape[1]
    if not has_expand:
        # uniform kernel signature (unused when has_expand is False)
        w1 = jnp.eye(cinp, cep, dtype=jnp.float32)
        b1 = jnp.zeros((1, cep), jnp.float32)

    common = dict(
        tile=tile, hl=hl, offsets=tuple(offsets), width=w, hw=hw, fast=fast,
        has_expand=has_expand,  # no-expand blocks feed x straight to the dw
    )

    full = lambda shape: pl.BlockSpec(
        shape, lambda i, j: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    scratch = [
        pltpu.VMEM((tile + 2 * hl, cinp), jnp.float32),
        pltpu.SemaphoreType.DMA(()),
    ]

    se_sum = pl.pallas_call(
        functools.partial(_pass1_kernel, cinp=cinp, **common),
        out_shape=jax.ShapeDtypeStruct((b, 8, cep), jnp.float32),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            full(w1.shape),
            full(b1.shape),
            full(wd.shape),
            full(bd.shape),
        ],
        out_specs=pl.BlockSpec((1, 8, cep), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(x_pad, w1, b1, wd, bd)

    s_mean = se_sum[:, 0, :ce] / float(hw)  # [B, Ce]
    hidden = jax.nn.swish(
        s_mean @ jnp.asarray(folded["wr"]) + jnp.asarray(folded["br"])
    )
    gate = jax.nn.sigmoid(
        hidden @ jnp.asarray(folded["we"]) + jnp.asarray(folded["be"])
    )
    gate_p = jnp.pad(gate[:, None, :], ((0, 0), (0, 7), (0, cep - ce)))

    out = pl.pallas_call(
        functools.partial(
            _pass2_kernel, skip=skip, cout_p=cout_p, **common
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles * tile, cout_p), jnp.float32),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            full(w1.shape),
            full(b1.shape),
            full(wd.shape),
            full(bd.shape),
            pl.BlockSpec((1, 8, cep), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            full(wp.shape),
            full(bp.shape),
        ],
        out_specs=pl.BlockSpec(
            (1, tile, cout_p), lambda i, j: (i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(x_pad, w1, b1, wd, bd, gate_p, wp, bp)
    return out[:, :hw, :cout].reshape(b, h, w, cout)
