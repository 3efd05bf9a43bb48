"""Fused MBConv block v2: whole-clip feature map resident in VMEM.

Second-generation fused MBConv Pallas kernel (first generation:
ops/fused_mbconv.py — kept as the numerics reference). The v1 kernel lost
13x to XLA's eval forward because of (a) per-grid-step *serial* manual DMA
(no overlap) and (b) Mosaic relayout copies for every one of the k*k
sublane-shifted views of the flattened-row layout (PERF.md).

v2 fixes both structurally:

  * Grid is (B,): each grid step processes ONE clip's ENTIRE [H, W, C]
    feature map, which fits VMEM at audio resolutions (worst case, B2
    stage-2 block 0: [64, 528, 96] bf16 ~= 8.6 MiB). Blocks are fed by
    standard BlockSpec pipelining, so the next clip's DMA overlaps the
    current clip's compute (automatic double buffering) — no manual DMA.
  * The depthwise conv runs on a 3-D [H, W, C] halo scratch (H outer
    dim, W sublanes, C lanes). H-offset taps are *free* outer-dim slices;
    only the k distinct W-offsets pay a relayout, each shared across the
    k H-taps (k copies instead of k*k shifted views of the map).
  * The halo margins are zero-filled in the scratch itself, so SAME
    padding needs no per-tap validity masks at all (v1 needed row masks
    plus 2m+1 wraparound column masks).
  * Squeeze-excite is per-clip, so eval mode needs ONE pass: the SE MLP's
    two tiny matmuls run in-kernel between the depthwise and project
    convs. (v1 needed two grid passes + an XLA round trip.)

Stride-2 blocks (first block of stages 2/3/4/6) are handled by splitting
the input into W-parity planes on the XLA side (cheap narrow-tensor
relayout that fuses into the producer): tap (dh, dw) then reads parity
dw%2 at W-offset dw//2, and the H-stride becomes a static strided slice
of the outer (untiled) dim.

Reference semantics: efficientnet_pytorch MBConvBlock.forward as used by
PSLA (reference src/models/Models.py:69-72,109); parity is tested against
the flax MBConvBlock (models/efficientnet.py) in eval mode with BN folded
(fold_block_params from ops/fused_mbconv.py).

Performance verdict (v5e, see PERF.md for the full ablation): the v2
structure fixes v1's DMA serialization (I/O overhead is ~0.3 ms over the
compute floor at B=64) but the kernel is VPU-bound — depthwise taps,
swish, and SE together cost ~2.7 ms on the stage-2 repeat block where
XLA's entire eval forward is 1.40 ms at its HBM roofline, and the same
VPU cost would dominate a custom-VJP training version (XLA train
fwd+bwd bar: 8.18 ms for that block). Kept as exact, tested
infrastructure, not wired into the model's hot path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def same_pad(n: int, k: int, s: int) -> tuple[int, int, int]:
    """jax/TF 'SAME' padding: returns (out, lo, hi) for one spatial dim."""
    out = -(-n // s)
    total = max((out - 1) * s + k - n, 0)
    lo = total // 2
    return out, lo, total - lo


def _dot(a, w, fast: bool):
    if fast:
        return jnp.dot(
            a.astype(jnp.bfloat16),
            w.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    return jnp.dot(
        a.astype(jnp.float32), w, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _block_body(
    x2, refs, es_ref, *, h, w, k, stride, has_expand, fast, act_dtype,
):
    """Expand -> halo scratch -> depthwise -> post-dw activation.

    x2: [HW, Ci] (stride 1) or a pair of W-parity planes
        ([H, Whp, Ci], [H, Whp, Ci]) (stride 2).
    Returns d: [Ho, Wo, Ce] post-depthwise swish activations (act_dtype).
    """
    w1_ref, b1_ref, wd_ref, bd_ref = refs
    ho, lo_h, _ = same_pad(h, k, stride)
    wo, lo_w, _ = same_pad(w, k, stride)

    if stride == 1:
        if has_expand:
            # swish stays f32: bf16 logistic hits a Mosaic lowering bug
            # ('vector.broadcast' element type mismatch)
            e = jax.nn.swish(
                _dot(x2, w1_ref[...], fast) + b1_ref[...]
            ).astype(act_dtype)
        else:
            e = x2.astype(act_dtype)
        ce = e.shape[-1]
        wh = w + k - 1
        hh_total = es_ref.shape[0]
        # zero only the halo margins (the interior is fully overwritten)
        es_ref[0:lo_h] = jnp.zeros_like(es_ref[0:lo_h])
        es_ref[lo_h + h:hh_total] = jnp.zeros_like(es_ref[lo_h + h:hh_total])
        es_ref[lo_h:lo_h + h, 0:lo_w] = jnp.zeros_like(
            es_ref[lo_h:lo_h + h, 0:lo_w]
        )
        es_ref[lo_h:lo_h + h, lo_w + w:wh] = jnp.zeros_like(
            es_ref[lo_h:lo_h + h, lo_w + w:wh]
        )
        es_ref[lo_h:lo_h + h, lo_w:lo_w + w, :] = e.reshape(h, w, ce)
        acc = jnp.zeros((ho, wo, ce), jnp.float32)
        for dw in range(k):
            esl = es_ref[:, dw:dw + wo, :]  # [Hh, Wo, Ce] (one relayout)
            for dh in range(k):
                tap = wd_ref[dh * k + dw, :][None, None, :].astype(act_dtype)
                acc = acc + (esl[dh:dh + ho] * tap).astype(jnp.float32)
    else:
        # x2 = (x_even, x_odd): W-parity planes of the lo_w-padded input,
        # each [H, Whp, Ci]. Parity split happens on the XLA side. The
        # expand conv maps padded zeros to swish(b1) != 0, so only the
        # VALID column range of each plane is written into the zeroed
        # scratch — SAME padding must zero the depthwise INPUT (the
        # post-expand activation), not the block input.
        planes = []
        for xp in x2:
            hp, whp, ci = xp.shape
            flat = xp.reshape(hp * whp, ci)
            if has_expand:
                ep = jax.nn.swish(
                    _dot(flat, w1_ref[...], fast) + b1_ref[...]
                ).astype(act_dtype)
            else:
                ep = flat.astype(act_dtype)
            planes.append(ep.reshape(hp, whp, -1))
        ce = planes[0].shape[-1]
        whp = planes[0].shape[1]
        # Mosaic forbids strided slices of vectors, so the H stride is
        # handled the same way as W: parity planes. The scratch is
        # [w_par, h_par, Hh2, Whp, Ce]; tap (dh, dw) reads plane
        # (dw%2, dh%2) at outer offset dh//2 (free) and sublane offset
        # dw//2 (k shared relayout slices total).
        hpad = h + (h % 2)
        es_ref[...] = jnp.zeros_like(es_ref)
        for p_w in range(2):
            # plane column q holds padded-W coordinate 2q+p_w; the valid
            # input occupies padded coords [lo_w, lo_w + w)
            qlo = max(0, -(-(lo_w - p_w) // 2))
            qhi = min(whp, -(-(lo_w + w - p_w) // 2))
            ep = planes[p_w]
            if hpad != h:  # odd H: one zero row so the H-parity reshape works
                ep = jnp.concatenate(
                    [ep, jnp.zeros((1,) + ep.shape[1:], ep.dtype)], axis=0
                )
            ep_r = ep.reshape(hpad // 2, 2, whp, ce)
            for p_h in range(2):
                # plane row t holds padded-H coordinate 2t+p_h; valid
                # padded coords are [lo_h, lo_h + h)
                tlo = max(0, -(-(lo_h - p_h) // 2))
                thi = -(-(lo_h + h - p_h) // 2)
                r0 = (2 * tlo + p_h - lo_h) % 2
                j0 = (2 * tlo + p_h - lo_h - r0) // 2
                es_ref[p_w, p_h, tlo:thi, qlo:qhi, :] = (
                    ep_r[j0:j0 + (thi - tlo), r0, qlo:qhi, :]
                )
        acc = jnp.zeros((ho, wo, ce), jnp.float32)
        for dw in range(k):
            p_w, q_w = dw % 2, dw // 2
            esl = es_ref[p_w, :, :, q_w:q_w + wo, :]  # [2, Hh2, Wo, Ce]
            for dh in range(k):
                p_h, q_h = dh % 2, dh // 2
                tap = wd_ref[dh * k + dw, :][None, None, :].astype(act_dtype)
                sl = esl[p_h, q_h:q_h + ho]
                acc = acc + (sl * tap).astype(jnp.float32)
    return (
        jax.nn.swish(acc + bd_ref[...][None, :, :]).astype(act_dtype),
        ho,
        wo,
    )


def _eval_kernel(
    *refs, h, w, k, stride, has_expand, skip, fast, act_dtype, cout,
):
    if stride == 1:
        (x_ref, w1_ref, b1_ref, wd_ref, bd_ref, wr_ref, br_ref, we_ref,
         be_ref, wp_ref, bp_ref, y_ref, es_ref) = refs
        x2 = x_ref[0]
    else:
        (xe_ref, xo_ref, w1_ref, b1_ref, wd_ref, bd_ref, wr_ref, br_ref,
         we_ref, be_ref, wp_ref, bp_ref, y_ref, es_ref) = refs
        x2 = (xe_ref[0], xo_ref[0])
    d, ho, wo = _block_body(
        x2, (w1_ref, b1_ref, wd_ref, bd_ref), es_ref,
        h=h, w=w, k=k, stride=stride, has_expand=has_expand, fast=fast,
        act_dtype=act_dtype,
    )
    ce = d.shape[-1]
    # squeeze-excite on the VPU: M=1 matmuls are MXU-latency-bound
    # (measured 0.6 ms/64 clips), so the two tiny SE layers run as
    # broadcast-multiply + lane/sublane reductions instead. wr is
    # provided TRANSPOSED ([Cse, Ce]) and br as a column for this.
    s_mean = (
        jnp.sum(d.astype(jnp.float32), axis=(0, 1)) / float(ho * wo)
    ).reshape(1, ce)
    hid = jax.nn.swish(
        jnp.sum(wr_ref[...] * s_mean, axis=1, keepdims=True) + br_ref[...]
    )  # [Cse, 1]
    gate = jax.nn.sigmoid(
        jnp.sum(hid * we_ref[...], axis=0, keepdims=True) + be_ref[...]
    )  # [1, Ce]
    g = d * gate.reshape(1, 1, ce).astype(d.dtype)
    p = _dot(g.reshape(ho * wo, ce), wp_ref[...], fast) + bp_ref[...]
    if skip:
        p = p + x2.astype(jnp.float32)[:, :cout]
    y_ref[0] = p.astype(y_ref.dtype)


def _parity_split(x: jax.Array, k: int, stride: int):
    """[B, H, W, C] -> lo_w-padded W-parity planes [B, H, Whp, C] x2."""
    b, h, w, c = x.shape
    wo, lo_w, _ = same_pad(w, k, stride)
    # taps read parity index wo + dw//2, dw<k  =>  need Whp >= wo_max + ...
    whp = wo + (k - 1) // 2
    wpad = 2 * whp - w - lo_w
    xp = jnp.pad(x, ((0, 0), (0, 0), (lo_w, wpad), (0, 0)))
    xp = xp.reshape(b, h, whp, 2, c)
    return xp[:, :, :, 0, :], xp[:, :, :, 1, :]


def fused_mbconv_eval_v2(
    x: jax.Array,
    folded: dict,
    kernel: int,
    stride: int = 1,
    fast: bool = True,
    interpret: bool | None = None,
    vmem_limit_mb: int = 110,
) -> jax.Array:
    """One MBConv block, eval mode (BN folded). x: [B,H,W,Ci] -> [B,Ho,Wo,Co].

    folded: output of ops.fused_mbconv.fold_block_params. fast=True runs
    matmuls/taps in bf16 (training operating point); fast=False is the
    f32 parity mode used by tests.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, w, cin = x.shape
    k = kernel
    has_expand = "w1" in folded
    ce = folded["wd"].shape[1]
    cout = folded["wp"].shape[1]
    skip = stride == 1 and cin == cout
    act_dtype = jnp.bfloat16 if fast else jnp.float32

    ho, lo_h, _ = same_pad(h, k, stride)
    wo, lo_w, _ = same_pad(w, k, stride)
    hh = (ho - 1) * stride + k

    f32 = lambda a: jnp.asarray(a, jnp.float32)
    if has_expand:
        w1, b1 = f32(folded["w1"]), f32(folded["b1"]).reshape(1, -1)
    else:  # placeholders with the right trailing dim (unused)
        w1 = jnp.zeros((cin, ce), jnp.float32)
        b1 = jnp.zeros((1, ce), jnp.float32)
    wd = f32(folded["wd"])                      # [k*k, Ce]
    bd = f32(folded["bd"]).reshape(1, -1)
    # SE weights in VPU-reduction layout: wr transposed, br as a column
    wr, br = f32(folded["wr"]).T, f32(folded["br"]).reshape(-1, 1)
    we, be = f32(folded["we"]), f32(folded["be"]).reshape(1, -1)
    wp, bp = f32(folded["wp"]), f32(folded["bp"]).reshape(1, -1)

    full = lambda a: pl.BlockSpec(
        a.shape, lambda i: tuple(0 for _ in a.shape),
        memory_space=pltpu.VMEM,
    )
    weights = [w1, b1, wd, bd, wr, br, we, be, wp, bp]
    kern = functools.partial(
        _eval_kernel, h=h, w=w, k=k, stride=stride, has_expand=has_expand,
        skip=skip, fast=fast, act_dtype=act_dtype, cout=cout,
    )
    if stride == 1:
        inputs = [x.reshape(b, h * w, cin)]
        in_specs = [
            pl.BlockSpec((1, h * w, cin), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        scratch = [pltpu.VMEM((hh, w + k - 1, ce), act_dtype)]
    else:
        xe, xo = _parity_split(x, k, stride)
        whp = xe.shape[2]
        inputs = [xe, xo]
        in_specs = [
            pl.BlockSpec((1, h, whp, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(2)
        ]
        hh2 = max(ho + (k - 1) // 2, -(-(lo_h + h) // 2))
        scratch = [pltpu.VMEM((2, 2, hh2, whp, ce), act_dtype)]

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, ho * wo, cout), x.dtype),
        grid=(b,),
        in_specs=in_specs + [full(a) for a in weights],
        out_specs=pl.BlockSpec((1, ho * wo, cout), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # whole-map-in-VMEM design: the worst B2 block (stage-1 repeat
            # at 64x528, C padded to 128 lanes) needs ~80 MiB live
            vmem_limit_bytes=vmem_limit_mb * 1024 * 1024,
        ),
        interpret=interpret,
    )(*inputs, *weights)
    return out.reshape(b, ho, wo, cout)
