#!/usr/bin/env python
"""Twitter/RecSys-2020 preprocessing CLI (counterpart of the reference's
``data/large/preprocess_twitter.py``): min-max scale the dense engagement
features, frequency-threshold (cutoff 8) map the sparse features, random
train/valid/test split, parquet output + feature map.

Usage: python scripts/preprocess_twitter.py <raw.(csv|parquet)> <out_dir> \
    [--cutoff 8] [--dense-cols ...] [--sparse-cols ...]
"""
import argparse
import sys

sys.path.insert(0, ".")

import pandas as pd

from xsdeepfwfm_deprecated_tpu.data.preprocess import preprocess_twitter

# reference column layout (data/large/preprocess_twitter.py:20-43):
# 4 engagement labels, 11 dense counters, 32 sparse/categorical fields
DEFAULT_LABELS = ["reply", "retweet", "retweet_comment", "like"]
DEFAULT_DENSE = ["photo", "video", "link", "domains", "hashtags",
                 "present_media", "present_links", "present_domains",
                 "tweet_len", "follower_count", "following_count"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("raw_path")
    ap.add_argument("out_dir")
    ap.add_argument("--cutoff", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--label-cols", nargs="*", default=DEFAULT_LABELS)
    ap.add_argument("--dense-cols", nargs="*", default=DEFAULT_DENSE)
    ap.add_argument("--sparse-cols", nargs="*", default=None,
                    help="default: every remaining column")
    args = ap.parse_args()

    if args.raw_path.endswith(".parquet"):
        df = pd.read_parquet(args.raw_path)
    else:
        df = pd.read_csv(args.raw_path)
    sparse = args.sparse_cols or [
        c for c in df.columns if c not in set(args.label_cols + args.dense_cols)]
    train_df, valid_df, test_df, maps = preprocess_twitter(
        df, dense_features=args.dense_cols, sparse_features=sparse,
        label_cols=tuple(args.label_cols), cutoff=args.cutoff, seed=args.seed,
        out_dir=args.out_dir)
    print(f"{args.out_dir}: train {len(train_df)} / valid {len(valid_df)} / "
          f"test {len(test_df)} rows, {len(sparse)} sparse fields")


if __name__ == "__main__":
    main()
