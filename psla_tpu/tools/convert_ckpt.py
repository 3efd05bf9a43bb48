"""CLI: convert a reference PyTorch .pth checkpoint to a psla_tpu orbax
checkpoint.

    python -m psla_tpu.tools.convert_ckpt \
        --pth as_mdl_0.pth --model efficientnet --n-class 527 --out ckpt_dir
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--pth", required=True)
    p.add_argument("--model", default="efficientnet",
                   choices=["efficientnet", "resnet", "mbnet"])
    p.add_argument("--n-class", type=int, default=527)
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)

    from psla_tpu.models.convert import load_pth
    import orbax.checkpoint as ocp

    variables = load_pth(args.pth, args.model, args.n_class)
    n = sum(int(np.prod(np.shape(x))) for x in
            __import__("jax").tree.leaves(variables["params"]))
    ocp.PyTreeCheckpointer().save(os.path.abspath(args.out), variables)
    print(f"converted {args.pth} ({n / 1e6:.2f}M params) -> {args.out}")


if __name__ == "__main__":
    main()
