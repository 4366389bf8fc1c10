"""Variation-factor dataset filter CLI (reference utils/filter_dataset.py).

python -m mst_tpu.data.filter_dataset --data_path in.pkl --out_path out.pkl \
    --varf avg_vel --lower 0.5 --upper 3.5
"""

import argparse

from mst_tpu.data.splits import filter_dataset_by_varf


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_path", required=True)
    parser.add_argument("--out_path", required=True)
    parser.add_argument("--varf", default="avg_vel")
    parser.add_argument("--lower", type=float, required=True)
    parser.add_argument("--upper", type=float, required=True)
    parser.add_argument("--obs_len", default=None, type=int)
    args = parser.parse_args()
    df = filter_dataset_by_varf(args.data_path, args.out_path, args.varf,
                                args.lower, args.upper, args.obs_len)
    print(f"Filtered {df.metaId.nunique()} trajectories -> {args.out_path}")


if __name__ == "__main__":
    main()
