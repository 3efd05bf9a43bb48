"""CLI: generate the balanced-sampling weight file
(reference: src/gen_weight_file.py CLI).

    python -m psla_tpu.tools.gen_weight_file \
        --label_indices_path labels.csv --datafile_path data.json
"""

from __future__ import annotations

import argparse

from psla_tpu.data.sampler import gen_weight_file


def main(argv=None):
    p = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    p.add_argument("--label_indices_path", type=str, required=True)
    p.add_argument("--datafile_path", type=str, required=True)
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args(argv)
    out = gen_weight_file(args.datafile_path, args.label_indices_path, args.out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
