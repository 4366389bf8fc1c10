"""Random train/val/test splitter CLI (reference utils/split_dataset.py).

python -m mst_tpu.data.split_dataset --data_dir ... --data_filename x.pkl
"""

import argparse

from mst_tpu.data.splits import split_train_val_test_randomly


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_dir", required=True)
    parser.add_argument("--data_filename", required=True)
    parser.add_argument("--val_split", default=0.1, type=float)
    parser.add_argument("--test_split", default=0.2, type=float)
    parser.add_argument("--seed", default=1, type=int)
    args = parser.parse_args()
    split_train_val_test_randomly(args.data_dir, args.data_filename,
                                  args.val_split, args.test_split, args.seed)


if __name__ == "__main__":
    main()
