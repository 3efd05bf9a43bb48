"""Turnkey ImageNet pretrained-weight resolution — the "P" of PSLA.

The reference loads ImageNet weights automatically via
``EfficientNet.from_pretrained('efficientnet-b2', in_channels=1)``
(src/models/Models.py:69-72; torchvision pretrained backbones for
ResNetAttention/MBNet at Models.py:18, 51) — worth several mAP points
(SURVEY.md §7.3.2). This module gives ``--impretrain True`` the same
just-works behavior:

  1. an explicit ``--pretrained-ckpt`` path always wins (handled by the
     caller);
  2. the ``PSLA_TPU_IMAGENET_CKPT`` env var names a checkpoint file;
  3. known cache directories are searched for the standard checkpoint
     filenames (``efficientnet-b2-*.pth`` from lukemelas/EfficientNet-PyTorch,
     ``resnet50-*.pth`` / ``mobilenet_v2-*.pth`` from torchvision) —
     including torch hub's cache, so weights fetched once by the reference
     are found here too;
  4. if nothing is on disk, the canonical release URL is downloaded into
     ``~/.cache/psla_tpu`` (disable with ``PSLA_TPU_NO_DOWNLOAD=1``);
  5. otherwise a ``MissingPretrainedError`` is raised with exact
     instructions — NEVER a silent fall-through to random init.
"""

from __future__ import annotations

import glob
import os

__all__ = [
    "MissingPretrainedError",
    "resolve_imagenet_checkpoint",
    "convert_imagenet_state_dict",
    "load_imagenet_variables",
]

CKPT_ENV = "PSLA_TPU_IMAGENET_CKPT"
CACHE_ENV = "PSLA_TPU_CACHE"
NO_DOWNLOAD_ENV = "PSLA_TPU_NO_DOWNLOAD"

_EFFNET_RELEASE = (
    "https://github.com/lukemelas/EfficientNet-PyTorch/releases/download"
)
# canonical checkpoint URLs: efficientnet_pytorch's url_map (the exact
# files Models.py:69-72 downloads) and torchvision's model zoo
IMAGENET_URLS = {
    ("efficientnet", 0): f"{_EFFNET_RELEASE}/1.0/efficientnet-b0-355c32eb.pth",
    ("efficientnet", 1): f"{_EFFNET_RELEASE}/1.0/efficientnet-b1-f1951068.pth",
    ("efficientnet", 2): f"{_EFFNET_RELEASE}/1.0/efficientnet-b2-8bb594d6.pth",
    ("efficientnet", 3): f"{_EFFNET_RELEASE}/1.0/efficientnet-b3-5fb5a3c3.pth",
    ("efficientnet", 4): f"{_EFFNET_RELEASE}/1.0/efficientnet-b4-6ed6700e.pth",
    ("efficientnet", 5): f"{_EFFNET_RELEASE}/1.0/efficientnet-b5-b6417697.pth",
    ("efficientnet", 6): f"{_EFFNET_RELEASE}/1.0/efficientnet-b6-c76e70fd.pth",
    ("efficientnet", 7): f"{_EFFNET_RELEASE}/1.0/efficientnet-b7-dcc49843.pth",
    ("resnet", None): "https://download.pytorch.org/models/resnet50-19c8e357.pth",
    ("mbnet", None): "https://download.pytorch.org/models/mobilenet_v2-b0353104.pth",
}


class MissingPretrainedError(RuntimeError):
    """impretrain=True but no ImageNet weights could be resolved."""


def _patterns(model: str, eff_b: int) -> list[str]:
    if model == "efficientnet":
        # both the standard and the AdvProp releases convert identically
        return [f"efficientnet-b{eff_b}-*.pth",
                f"adv-efficientnet-b{eff_b}-*.pth"]
    if model == "resnet":
        return ["resnet50-*.pth"]
    if model == "mbnet":
        return ["mobilenet_v2-*.pth"]
    raise ValueError(f"unknown model {model!r}")


def cache_dirs() -> list[str]:
    home = os.path.expanduser("~")
    dirs = []
    if os.environ.get(CACHE_ENV):
        dirs.append(os.environ[CACHE_ENV])
    dirs.append(os.path.join(home, ".cache", "psla_tpu"))
    # torch.hub's default download location — where efficientnet_pytorch
    # and torchvision put these exact files
    dirs.append(os.path.join(home, ".cache", "torch", "hub", "checkpoints"))
    dirs.append(os.path.join(home, ".cache", "torch", "checkpoints"))
    return dirs


def find_imagenet_checkpoint(model: str, eff_b: int) -> str | None:
    """Search the cache directories; return the first match or None."""
    env_path = os.environ.get(CKPT_ENV)
    if env_path:
        if not os.path.exists(env_path):
            raise MissingPretrainedError(
                f"{CKPT_ENV}={env_path} does not exist"
            )
        return env_path
    for d in cache_dirs():
        for pat in _patterns(model, eff_b):
            hits = sorted(glob.glob(os.path.join(d, pat)))
            if hits:
                return hits[0]
    return None


def download_imagenet_checkpoint(model: str, eff_b: int) -> str:
    """Fetch the canonical checkpoint into the psla_tpu cache dir."""
    import urllib.request

    key = (model, eff_b if model == "efficientnet" else None)
    url = IMAGENET_URLS[key]
    dest_dir = os.environ.get(
        CACHE_ENV, os.path.join(os.path.expanduser("~"), ".cache", "psla_tpu")
    )
    os.makedirs(dest_dir, exist_ok=True)
    dest = os.path.join(dest_dir, os.path.basename(url))
    tmp = dest + ".part"
    print(f"downloading ImageNet weights: {url}")
    urllib.request.urlretrieve(url, tmp)
    os.replace(tmp, dest)
    return dest


def resolve_imagenet_checkpoint(model: str, eff_b: int = 2) -> str:
    """Return a path to ImageNet weights for ``model`` or raise loudly.

    Mirrors the auto-load of the reference (Models.py:69-72) with an
    explicit failure mode instead of its implicit network dependency.
    """
    found = find_imagenet_checkpoint(model, eff_b)
    if found:
        return found
    err = None
    if not os.environ.get(NO_DOWNLOAD_ENV):
        try:
            return download_imagenet_checkpoint(model, eff_b)
        except Exception as e:  # no network / bad URL -> instructive error
            err = e
    key = (model, eff_b if model == "efficientnet" else None)
    url = IMAGENET_URLS.get(key, "(no canonical URL for this model)")
    raise MissingPretrainedError(
        "impretrain=True but no ImageNet weights were found"
        + (f" and the download failed ({err})" if err is not None else "")
        + ".\nTo fix, one of:\n"
        f"  * download {url}\n"
        f"    into {cache_dirs()[0] if os.environ.get(CACHE_ENV) else os.path.join('~', '.cache', 'psla_tpu')} "
        "(any searched cache dir works: "
        + ", ".join(cache_dirs()) + ")\n"
        f"  * set {CKPT_ENV}=/path/to/checkpoint.pth\n"
        "  * pass --pretrained-ckpt /path/to/checkpoint.pth\n"
        "  * or pass --impretrain False to train from scratch "
        "(costs several mAP points — SURVEY.md §7.3.2)"
    )


def convert_imagenet_state_dict(sd, model: str, init_variables):
    """Route a loaded ImageNet state dict to its per-model converter,
    keeping the fresh pooling head / classifier from ``init_variables``.
    The single dispatch point — Trainer._load_pretrained uses this too."""
    from psla_tpu.models import convert

    if model == "efficientnet":
        return convert.convert_imagenet_backbone(sd, init_variables)
    if model == "resnet":
        return convert.convert_imagenet_resnet(sd, init_variables)
    if model == "mbnet":
        return convert.convert_imagenet_mbnet(sd, init_variables)
    raise ValueError(f"unknown model {model!r}")


def load_imagenet_variables(path: str, model: str, init_variables):
    """torch.load + convert an ImageNet backbone checkpoint, keeping the
    fresh pooling head / classifier from ``init_variables``."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    return convert_imagenet_state_dict(sd, model, init_variables)
