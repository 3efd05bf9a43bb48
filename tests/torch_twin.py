"""A faithful ~150-line torch reimplementation of the reference training
stack, used as an end-to-end accuracy oracle (round-1 verdict #5).

Mirrors, semantically and in state_dict key layout, the reference's:
  * EfficientNet backbone (efficientnet_pytorch semantics: TF-SAME
    asymmetric padding, BN eps 1e-3 / momentum 0.01, swish, SE ratio on
    INPUT filters, per-block key names `_expand_conv/_bn0/...`) —
    src/models/Models.py:69-72;
  * MHeadAttention pooling (per-head att/cla 1x1 convs, sigmoid, clamp,
    normalize over time, learnable head_weight) — HigherModels.py:117-167;
  * the train step: Adam(wd=5e-7, betas=(0.95, 0.999)), BCE on clamped
    probabilities — traintest.py:52, 102-109.

state_dict() keys match the reference layout exactly, so
psla_tpu.models.convert.convert_checkpoint consumes them directly —
letting a test start BOTH frameworks from identical weights and compare
whole training trajectories.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F

from psla_tpu.models.efficientnet import efficientnet_arch


def _same_pad(x, kernel, stride):
    """TF-SAME asymmetric padding (Conv2dStaticSamePadding semantics)."""
    ih, iw = x.shape[-2:]
    ph = max((-(-ih // stride) - 1) * stride + kernel - ih, 0)
    pw = max((-(-iw // stride) - 1) * stride + kernel - iw, 0)
    if ph or pw:
        x = F.pad(x, [pw // 2, pw - pw // 2, ph // 2, ph - ph // 2])
    return x


class _SameConv(nn.Conv2d):
    def __init__(self, cin, cout, kernel, stride=1, groups=1, bias=False):
        super().__init__(cin, cout, kernel, stride, 0, groups=groups, bias=bias)
        self._k, self._s = kernel, stride

    def forward(self, x):
        return self._conv_forward(
            _same_pad(x, self._k, self._s), self.weight, self.bias
        )


def _bn(c):
    return nn.BatchNorm2d(c, eps=1e-3, momentum=0.01)


class _MBConv(nn.Module):
    def __init__(self, args, stride, cin):
        super().__init__()
        cout, exp = args.out_filters, cin * args.expand_ratio
        if args.expand_ratio != 1:
            self._expand_conv = _SameConv(cin, exp, 1)
            self._bn0 = _bn(exp)
        self._depthwise_conv = _SameConv(exp, exp, args.kernel, stride, groups=exp)
        self._bn1 = _bn(exp)
        se = max(1, int(cin * args.se_ratio))
        self._se_reduce = _SameConv(exp, se, 1, bias=True)
        self._se_expand = _SameConv(se, exp, 1, bias=True)
        self._project_conv = _SameConv(exp, cout, 1)
        self._bn2 = _bn(cout)
        self._skip = stride == 1 and cin == cout

    def forward(self, x):
        inp = x
        if hasattr(self, "_expand_conv"):
            x = F.silu(self._bn0(self._expand_conv(x)))
        x = F.silu(self._bn1(self._depthwise_conv(x)))
        s = x.mean((2, 3), keepdim=True)
        s = self._se_expand(F.silu(self._se_reduce(s)))
        x = x * torch.sigmoid(s)
        x = self._bn2(self._project_conv(x))
        if self._skip:  # drop-connect disabled (rate 0) for determinism
            x = x + inp
        return x


class _EffNet(nn.Module):
    """Feature extractor with efficientnet_pytorch key names."""

    def __init__(self, b: int):
        super().__init__()
        stem, blocks, head = efficientnet_arch(b)
        self._conv_stem = _SameConv(1, stem, 3, 2)
        self._bn0 = _bn(stem)
        mods = []
        for args, repeats in blocks:
            for rep in range(repeats):
                cin = args.in_filters if rep == 0 else args.out_filters
                mods.append(_MBConv(args, args.stride if rep == 0 else 1, cin))
        self._blocks = nn.ModuleList(mods)
        self._conv_head = _SameConv(blocks[-1][0].out_filters, head, 1)
        self._bn1 = _bn(head)
        self.feature_dim = head

    def forward(self, x):
        x = F.silu(self._bn0(self._conv_stem(x)))
        for blk in self._blocks:
            x = blk(x)
        return F.silu(self._bn1(self._conv_head(x)))


class _MHeadAttention(nn.Module):
    """HigherModels.py:117-167 (key layout: att.{i}/cla.{i}/head_weight)."""

    def __init__(self, n_in, n_out, head_num=4):
        super().__init__()
        self.att = nn.ModuleList(
            [nn.Conv2d(n_in, n_out, 1) for _ in range(head_num)]
        )
        self.cla = nn.ModuleList(
            [nn.Conv2d(n_in, n_out, 1) for _ in range(head_num)]
        )
        self.head_weight = nn.Parameter(
            torch.full((head_num,), 1.0 / head_num)
        )

    def forward(self, x):  # [B, C, T, 1]
        out = 0.0
        for i in range(len(self.att)):
            att = torch.sigmoid(self.att[i](x)).clamp(1e-7, 1 - 1e-7)
            cla = torch.sigmoid(self.cla[i](x))
            norm_att = att / att.sum(dim=2, keepdim=True)
            out = out + self.head_weight[i] * (norm_att * cla).sum(dim=2)
        return out[..., 0]  # [B, n_out]


class TwinEffNetAttention(nn.Module):
    """EffNetAttention twin (Models.py:63-113): fbank [B,T,F] -> probs."""

    def __init__(self, label_dim: int, b: int = 0, head_num: int = 4,
                 bn_momentum: float | None = None):
        super().__init__()
        self.effnet = _EffNet(b)
        self.attention = _MHeadAttention(
            self.effnet.feature_dim, label_dim, head_num
        )
        if bn_momentum is not None:
            # torch momentum convention: new = (1-m)*old + m*batch, i.e.
            # torch m == 1 - flax m (create_model's bn_momentum)
            for mod in self.modules():
                if isinstance(mod, nn.BatchNorm2d):
                    mod.momentum = bn_momentum

    def forward(self, x):  # [B, T, F]
        x = x.unsqueeze(1).transpose(2, 3)  # [B, 1, F, T]
        x = self.effnet(x)                  # [B, C, F/32, T/32]
        x = x.mean(dim=2, keepdim=True)     # freq average (AvgPool2d((4,1)))
        x = x.transpose(2, 3)               # [B, C, T/32, 1]
        return self.attention(x)


def twin_protocol_run(
    model,
    epochs_train,       # list over epochs of [(fbank, soft_labels), ...]
    val_batches,        # [(fbank, labels, n_valid), ...] fixed across epochs
    lr_of_step,         # global step -> lr (the SAME schedule fn both sides)
    wa_start: int,
    wa_end: int,
    calculate_stats,    # shared metrics fn (oracle-tested vs sklearn)
):
    """The reference's FULL training protocol on precomputed inputs:
    per-step scheduled Adam(wd=5e-7, betas=(0.95,0.999)) + BCE on clamped
    sigmoid (traintest.py:52, 92-109), per-epoch eval-mode validation with
    prediction accumulation, running checkpoint-ensemble of predictions
    (traintest.py:278-294), and 1/N weight averaging over epoch snapshots
    (traintest.py:296-322, with the deliberate N+1 fix this framework
    applies). Returns per-epoch rows {mAP, mAUC, train_loss, valid_loss,
    ens_mAP, ens_mAUC} plus the WA model's {wa_mAP, wa_mAUC}.

    The augmentation/mixup/schedule draws live in ``epochs_train`` /
    ``lr_of_step`` — the caller replays the jax run's exact inputs, so any
    trajectory disagreement is a training-engine divergence, not a data
    difference."""
    import copy

    import numpy as np

    opt = torch.optim.Adam(
        model.parameters(), lr=0.0, weight_decay=5e-7, betas=(0.95, 0.999)
    )

    def validate(m):
        m.eval()
        preds, targets, losses = [], [], []
        with torch.no_grad():
            for fb, lab, n_valid in val_batches:
                out = m(torch.from_numpy(fb)).clamp(1e-7, 1 - 1e-7)
                lab_t = torch.from_numpy(lab)
                per_sample = F.binary_cross_entropy(
                    out, lab_t, reduction="none"
                ).mean(dim=1)
                preds.append(out.numpy()[:n_valid])
                targets.append(lab[:n_valid])
                losses.append(per_sample.numpy()[:n_valid])
        pred = np.concatenate(preds)
        target = np.concatenate(targets)
        stats = calculate_stats(pred, target)
        mAP = float(np.mean([s["AP"] for s in stats]))
        mAUC = float(np.nanmean([s["auc"] for s in stats]))
        return pred, target, mAP, mAUC, float(np.mean(np.concatenate(losses)))

    crit = torch.nn.BCELoss()
    rows = []
    ens_sum = None
    snapshots = {}
    gstep = 0
    for epoch, batches in enumerate(epochs_train, start=1):
        model.train()
        step_losses = []
        for fb, lab in batches:
            for g in opt.param_groups:
                g["lr"] = float(lr_of_step(gstep))
            out = model(torch.from_numpy(fb)).clamp(1e-7, 1 - 1e-7)
            loss = crit(out, torch.from_numpy(lab))
            opt.zero_grad()
            loss.backward()
            opt.step()
            step_losses.append(float(loss.detach()))
            gstep += 1
        pred, target, mAP, mAUC, valid_loss = validate(model)
        ens_sum = pred if ens_sum is None else ens_sum + pred
        ens = ens_sum / epoch
        ens_stats = calculate_stats(ens, target)
        if wa_start <= epoch <= wa_end:
            snapshots[epoch] = copy.deepcopy(model.state_dict())
        rows.append({
            "mAP": mAP, "mAUC": mAUC,
            "train_loss": float(np.mean(step_losses)),
            "valid_loss": valid_loss,
            "ens_mAP": float(np.mean([s["AP"] for s in ens_stats])),
            "ens_mAUC": float(np.nanmean([s["auc"] for s in ens_stats])),
        })

    # 1/N weight averaging over the snapshot window (params + BN running
    # stats averaged; integer num_batches_tracked kept from the last epoch)
    keys = sorted(snapshots)
    avg = copy.deepcopy(snapshots[keys[-1]])
    for k, v in avg.items():
        if v.dtype.is_floating_point:
            avg[k] = sum(snapshots[e][k] for e in keys) / len(keys)
    model.load_state_dict(avg)
    _, _, wa_mAP, wa_mAUC, _ = validate(model)
    return rows, {"wa_mAP": wa_mAP, "wa_mAUC": wa_mAUC}


def twin_train_steps(model, fbanks, labels, lr: float, n_steps: int):
    """The reference train loop on precomputed fbanks: Adam(wd=5e-7,
    betas=(0.95,0.999)), BCE on clamped outputs (traintest.py:52,
    102-109). Constant lr (warmup/decay disabled to mirror the jax run's
    schedule config). Returns per-step losses."""
    opt = torch.optim.Adam(
        model.parameters(), lr, weight_decay=5e-7, betas=(0.95, 0.999)
    )
    crit = torch.nn.BCELoss()
    losses = []
    model.train()
    for i in range(n_steps):
        fb = torch.from_numpy(fbanks[i % len(fbanks)])
        lab = torch.from_numpy(labels[i % len(labels)])
        out = model(fb).clamp(1e-7, 1 - 1e-7)
        loss = crit(out, lab)
        opt.zero_grad()
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
    return losses
