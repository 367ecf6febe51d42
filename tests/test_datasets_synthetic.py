"""End-to-end smoke tests for the avazu / ali / twitter dataset families using
synthetic files in the reference's on-disk formats."""

import os

import numpy as np
import pytest

from xsdeepfwfm_deprecated_tpu.data import get_dataset
from xsdeepfwfm_deprecated_tpu.config import ModelConfig, TrainConfig
from xsdeepfwfm_deprecated_tpu.train.trainer import DeepFMEstimator


def write_map(path, field_positions_sizes, start=1):
    with open(path, "w") as f:
        for pos, size in field_positions_sizes:
            for idx in range(1, size):
                f.write(f"{pos},{idx},{idx}\n")


@pytest.fixture
def avazu_dir(tmp_path):
    """Avazu layout: 23 fields, 1 numeric; ali-style CSV with 'y2' header."""
    d = tmp_path / "large"
    d.mkdir()
    rng = np.random.default_rng(0)
    n_cat = 22
    sizes = [rng.integers(3, 9) for _ in range(n_cat)]
    for split in ("train", "valid", "test"):
        rows = ["y2," + ",".join(["x"] * 23)]   # header row the reader skips
        for _ in range(60):
            label = str(rng.integers(0, 2))
            num = [f"{rng.random():.2f}"]
            cats = [str(float(rng.integers(0, s))) for s in sizes]
            rows.append(",".join([label] + num + cats))
        (d / f"avazu_{split}.csv").write_text("\n".join(rows) + "\n")
    # field positions 2..23 (1-based overall), feature_dim_start=1
    write_map(str(d / "avazu_feature_map"),
              [(i + 2, int(s)) for i, s in enumerate(sizes)])
    return str(tmp_path)


def test_avazu_family_end_to_end(avazu_dir):
    field_size, train, valid, test = get_dataset("avazu", data_dir=avazu_dir)
    assert field_size == 23
    assert train["index"].shape[1] == 22
    assert train["value"].shape[1] == 1
    mcfg = ModelConfig(field_size=23, feature_sizes=tuple(train["feature_sizes"]),
                       numerical=1, embedding_size=4, h_depth=2, deep_nodes=16,
                       use_fwfm=True, use_deep=True)
    est = DeepFMEstimator(mcfg, TrainConfig(n_epochs=1, batch_size=32))
    est.fit(train["index"], train["value"], train["label"], [], [], [])
    loss, auc, _, _ = est.eval_by_batch(test["index"], test["value"], test["label"])
    assert np.isfinite(loss)


@pytest.fixture
def twitter_dir(tmp_path):
    """Twitter layout: 47 fields, 11 numeric, parquet with 4 label columns."""
    import pandas as pd
    d = tmp_path / "large"
    d.mkdir()
    rng = np.random.default_rng(1)
    n_cat = 36
    sizes = [int(rng.integers(3, 7)) for _ in range(n_cat)]
    cols = {}
    n = 50
    for lbl in ("reply", "retweet", "retweet_comment", "like"):
        cols[lbl] = rng.integers(0, 2, n)
    # after dropping 3 label cols: [label, 11 numeric, 36 cat]
    for i in range(11):
        cols[f"num{i}"] = rng.random(n)
    for i, s in enumerate(sizes):
        cols[f"cat{i}"] = rng.integers(0, s, n)
    df = pd.DataFrame(
        {**{k: cols[k] for k in ("reply", "retweet", "retweet_comment", "like")},
         **{f"num{i}": cols[f"num{i}"] for i in range(11)},
         **{f"cat{i}": cols[f"cat{i}"] for i in range(n_cat)}})
    for split in ("train", "valid", "test"):
        df.to_parquet(d / f"twitter_{split}_s.parquet")
    # reference reader: feature_dim_start=4, dim=47; map entries land at
    # cate_dict[pos-4]; numeric entries occupy 0..10, categoricals 11..46
    write_map(str(d / "twitter_feature_map_s"),
              [(i + 11 + 4, s) for i, s in enumerate(sizes)], )
    return str(tmp_path)


def test_twitter_family_reader(twitter_dir):
    field_size, train, valid, test = get_dataset("twitter", data_dir=twitter_dir,
                                                 twitter_category="like")
    assert field_size == 47
    assert train["value"].shape[1] == 11
    assert train["index"].shape[1] == 36
    assert len(train["feature_sizes"]) == 47
    assert set(np.unique(train["label"])) <= {0.0, 1.0}
