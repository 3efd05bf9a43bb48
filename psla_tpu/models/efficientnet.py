"""Flax EfficientNet-B0..B7 backbone (features only), TPU-first.

Reproduces the architecture behind the reference's
``EfficientNet.from_name('efficientnet-b{b}', in_channels=1)`` /
``extract_features`` calls (reference: src/models/Models.py:69-72, 109):
stem 3x3/s2 -> 7 MBConv stages (expand 1x1, depthwise k3/k5, squeeze-excite
ratio 0.25, project 1x1, BN+swish, stochastic depth up to 0.2) -> head 1x1
conv. Compound scaling per variant; B2 yields the 1408-channel feature map
the PSLA paper uses (Models.py:66 `middim`).

Differences from the reference implementation, by design:
  * NHWC layout and jax 'SAME' padding (identical math to torch
    Conv2dStaticSamePadding, but native to TPU/XLA — no explicit pad op).
  * BatchNorm statistics always tracked in float32; activations may be
    bfloat16 (``dtype``) for MXU throughput.
  * Stochastic-depth RNG comes from the flax 'dropout' rng collection, so
    the whole forward is a pure function of (params, batch_stats, rng).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from flax import linen as nn

from psla_tpu.models.layers import (
    ConvBN,
    ReferenceBatchNorm,
    conv_kernel_init,
    drop_connect,
    round_filters,
    round_repeats,
)


@dataclasses.dataclass(frozen=True)
class BlockArgs:
    kernel: int
    stride: int
    expand_ratio: int
    in_filters: int
    out_filters: int
    num_repeat: int
    se_ratio: float = 0.25


# The EfficientNet-B0 base architecture (7 stages).
BASE_BLOCKS: tuple[BlockArgs, ...] = (
    BlockArgs(3, 1, 1, 32, 16, 1),
    BlockArgs(3, 2, 6, 16, 24, 2),
    BlockArgs(5, 2, 6, 24, 40, 2),
    BlockArgs(3, 2, 6, 40, 80, 3),
    BlockArgs(5, 1, 6, 80, 112, 3),
    BlockArgs(5, 2, 6, 112, 192, 4),
    BlockArgs(3, 1, 6, 192, 320, 1),
)

# b -> (width_coefficient, depth_coefficient)
SCALING: dict[int, tuple[float, float]] = {
    0: (1.0, 1.0),
    1: (1.0, 1.1),
    2: (1.1, 1.2),
    3: (1.2, 1.4),
    4: (1.4, 1.8),
    5: (1.6, 2.2),
    6: (1.8, 2.6),
    7: (2.0, 3.1),
}

STEM_FILTERS = 32
HEAD_FILTERS = 1280
DROP_CONNECT_RATE = 0.2


def efficientnet_arch(b: int):
    """Resolved per-variant architecture: (stem, [(BlockArgs, repeats)], head).

    feature_dim(b) matches the reference's middim table
    [1280,1280,1408,1536,1792,2048,2304,2560] (Models.py:66).
    """
    width, depth = SCALING[b]
    stem = round_filters(STEM_FILTERS, width)
    blocks = []
    for args in BASE_BLOCKS:
        blocks.append(
            (
                dataclasses.replace(
                    args,
                    in_filters=round_filters(args.in_filters, width),
                    out_filters=round_filters(args.out_filters, width),
                ),
                round_repeats(args.num_repeat, depth),
            )
        )
    head = round_filters(HEAD_FILTERS, width)
    return stem, blocks, head


class _S2DStemConvBN(nn.Module):
    """Space-to-depth stem: mathematically EXACT rewrite of the 3x3/s2
    single-channel stem conv as a 2x2/s1 conv over 2x2 pixel blocks.

    The [B, F, T, 1] input pads its channel dim to a full 128-lane tile in
    TPU memory; re-expressing it as [B, F/2, T/2, 4] cuts that tiled
    footprint 4x and replaces the strided conv with a denser one. The
    parameter tree is unchanged (conv/kernel [3,3,1,C] + bn/*), so
    checkpoints trained either way are interchangeable.

    Derivation: with SAME padding at stride 2 on even extents, jax pads
    (lo=0, hi=1); output (i,j) reads x[2i..2i+2, 2j..2j+2]. Writing
    2i+u = 2(i+p)+di, the 3x3 taps map into a 2x2 block kernel
    K[p,q,(di,dj)] with K[0,0]=w[:2,:2], K[1,0,(0,dj)]=w[2,:2],
    K[0,1,(di,0)]=w[:2,2], K[1,1,(0,0)]=w[2,2], zero elsewhere; block
    padding (lo=0, hi=1) reproduces the original zero pad.
    """

    features: int
    act: str = "silu"
    bn_momentum: float = 0.99
    bn_eps: float = 1e-3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        import jax

        b, f, t, c = x.shape
        assert c == 1 and f % 2 == 0 and t % 2 == 0, (f, t, c)
        # kernel lives at .../stem/conv/kernel like the plain ConvBN stem
        w = _StemKernel(self.features, name="conv")()
        o = self.features
        kk = jnp.zeros((2, 2, 4, o), w.dtype)
        # channel layout of the 2x2 block: (di, dj) -> di*2 + dj
        for di in range(2):
            for dj in range(2):
                kk = kk.at[0, 0, di * 2 + dj].set(w[di, dj, 0])
        for dj in range(2):
            kk = kk.at[1, 0, dj].set(w[2, dj, 0])  # (di=0, dj)
        for di in range(2):
            kk = kk.at[0, 1, di * 2].set(w[di, 2, 0])  # (di, dj=0)
        kk = kk.at[1, 1, 0].set(w[2, 2, 0])

        y = x.reshape(b, f // 2, 2, t // 2, 2).transpose(0, 1, 3, 2, 4)
        y = y.reshape(b, f // 2, t // 2, 4).astype(self.dtype)
        out = jax.lax.conv_general_dilated(
            y,
            kk.astype(self.dtype),
            window_strides=(1, 1),
            padding=((0, 1), (0, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        out = ReferenceBatchNorm(
            use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=self.bn_eps,
            dtype=self.dtype,
            name="bn",
        )(out)
        return nn.silu(out)


class _StemKernel(nn.Module):
    """Holds the stem conv kernel under the standard 'conv/kernel' path."""

    features: int

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel", conv_kernel_init, (3, 3, 1, self.features)
        )


class MBConvBlock(nn.Module):
    """Mobile inverted bottleneck with squeeze-and-excitation."""

    kernel: int
    stride: int
    expand_ratio: int
    in_filters: int
    out_filters: int
    se_ratio: float
    drop_rate: float
    dtype: jnp.dtype = jnp.float32
    bn_momentum: float = 0.99
    act_compress: str = "none"  # int8 saved-activation experiment (qsave.py)

    @nn.compact
    def __call__(self, x, train: bool):
        inputs = x
        expanded = self.in_filters * self.expand_ratio
        if self.expand_ratio != 1:
            x = ConvBN(expanded, (1, 1), act="silu", dtype=self.dtype,
                       bn_momentum=self.bn_momentum, name="expand")(x, train)
        x = ConvBN(
            expanded,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            groups=expanded,
            act="silu",
            dtype=self.dtype,
            bn_momentum=self.bn_momentum,
            act_compress=self.act_compress,
            name="depthwise",
        )(x, train)

        if self.se_ratio > 0:
            se_filters = max(1, int(self.in_filters * self.se_ratio))
            s = jnp.mean(x, axis=(1, 2), keepdims=True)
            s = nn.Conv(
                se_filters, (1, 1), kernel_init=conv_kernel_init,
                dtype=self.dtype, name="se_reduce",
            )(s)
            s = nn.silu(s)
            s = nn.Conv(
                expanded, (1, 1), kernel_init=conv_kernel_init,
                dtype=self.dtype, name="se_expand",
            )(s)
            x = x * nn.sigmoid(s)

        x = ConvBN(self.out_filters, (1, 1), act=None, dtype=self.dtype,
                   bn_momentum=self.bn_momentum, name="project")(x, train)

        if self.stride == 1 and self.in_filters == self.out_filters:
            if self.drop_rate > 0 and train:
                rng = self.make_rng("dropout")
                x = drop_connect(x, rng, self.drop_rate, deterministic=not train)
            x = x + inputs
        return x


class EfficientNet(nn.Module):
    """EfficientNet feature extractor. Input NHWC; output [B, H/32, W/32, C]."""

    b: int = 2
    dtype: jnp.dtype = jnp.float32
    drop_connect_rate: float = DROP_CONNECT_RATE
    bn_momentum: float = 0.99  # flax convention: running = m*old + (1-m)*new
    # rematerialize each MBConv block in backward: saves only block
    # boundaries + BN stats, recomputing the 6x-expanded intermediates.
    # Cuts peak activation memory ~3x for large batches at ~18% step-time
    # cost (measured on v5e, bs=128) — a memory knob, not a speed knob.
    remat: bool = False
    # exact space-to-depth rewrite of the stem conv (see _S2DStemConvBN);
    # checkpoint-compatible either way. Measured NEUTRAL on v5e at bs=128
    # (XLA already handles the C=1 stem well); kept for other topologies.
    stem_s2d: bool = False
    # int8 compression of the depthwise-conv activations (ops/qsave.py):
    # 'none' | 'q8save' (exact fwd, int8-saved wgrad) | 'qdq'
    act_compress: str = "none"

    @property
    def feature_dim(self) -> int:
        return efficientnet_arch(self.b)[2]

    @nn.compact
    def __call__(self, x, train: bool = False):
        stem, blocks, head = efficientnet_arch(self.b)
        x = x.astype(self.dtype)
        if self.stem_s2d:
            x = _S2DStemConvBN(
                stem, dtype=self.dtype, bn_momentum=self.bn_momentum,
                name="stem",
            )(x, train)
        else:
            x = ConvBN(
                stem, (3, 3), strides=(2, 2), act="silu", dtype=self.dtype,
                bn_momentum=self.bn_momentum, name="stem"
            )(x, train)

        total = sum(r for _, r in blocks)
        idx = 0
        block_cls = (
            nn.remat(MBConvBlock, static_argnums=(2,)) if self.remat
            else MBConvBlock
        )
        for stage, (args, repeats) in enumerate(blocks):
            for rep in range(repeats):
                x = block_cls(
                    kernel=args.kernel,
                    stride=args.stride if rep == 0 else 1,
                    expand_ratio=args.expand_ratio,
                    in_filters=args.in_filters if rep == 0 else args.out_filters,
                    out_filters=args.out_filters,
                    se_ratio=args.se_ratio,
                    drop_rate=self.drop_connect_rate * idx / total,
                    dtype=self.dtype,
                    bn_momentum=self.bn_momentum,
                    act_compress=self.act_compress,
                    name=f"block_{idx}",
                )(x, train)
                idx += 1

        x = ConvBN(head, (1, 1), act="silu", dtype=self.dtype,
                   bn_momentum=self.bn_momentum, name="head")(x, train)
        return x
