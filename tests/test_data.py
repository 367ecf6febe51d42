"""Data-layer tests: readers, feature-size derivation, batching."""

import numpy as np
import pytest

from xsdeepfwfm_deprecated_tpu.data import batching, get_dataset
from xsdeepfwfm_deprecated_tpu.data.feature_map import (
    derive_feature_sizes_from_csv, feature_sizes_from_map, load_category_index,
    write_feature_map_stub)


def test_tiny_criteo_shapes(tiny_criteo):
    field_size, train, valid, test = tiny_criteo
    assert field_size == 39
    assert train["index"].shape == (10000, 26)
    assert train["value"].shape == (10000, 13)
    assert train["label"].shape == (10000,)
    assert len(train["feature_sizes"]) == 39
    assert train["feature_sizes"][:13] == [1] * 13
    # categorical sizes cover every index present in train AND test
    for col in range(26):
        assert train["index"][:, col].max() < train["feature_sizes"][13 + col]
        assert test["index"][:, col].max() < train["feature_sizes"][13 + col]


def test_labels_binary(tiny_criteo):
    _, train, _, _ = tiny_criteo
    assert set(np.unique(train["label"])) <= {0.0, 1.0}


def test_feature_map_roundtrip(tmp_path):
    sizes = [1, 1, 5, 3]
    path = tmp_path / "fmap"
    write_feature_map_stub(str(path), sizes, num_numeric=2)
    cate = load_category_index(str(path), feature_dim_start=0, dim=4)
    derived = feature_sizes_from_map(cate, num_list=[1, 2])
    assert derived == sizes


def test_derive_feature_sizes(tmp_path):
    rows = ["1,3,7,2,0", "0,1,2,4,1", "1,9,9,0,3"]
    p = tmp_path / "d.csv"
    p.write_text("\n".join(rows) + "\n")
    sizes = derive_feature_sizes_from_csv([str(p)], num_numeric=2)
    assert sizes == [1, 1, 5, 4]  # max idx 4→5, 3→4


def test_iter_batches_padding():
    n, bs = 25, 8
    xi = np.arange(n * 2, dtype=np.int32).reshape(n, 2)
    xv = np.ones((n, 3), np.float32)
    y = np.ones(n, np.float32)
    batches = list(batching.iter_batches(xi, xv, y, bs))
    assert len(batches) == 4
    assert all(b["xi"].shape == (bs, 2) for b in batches)
    assert batches[-1]["n_valid"] == 1
    assert batches[-1]["mask"].sum() == 1.0
    total_valid = sum(b["n_valid"] for b in batches)
    assert total_valid == n


def test_shuffle_arrays_consistent():
    rng = np.random.default_rng(0)
    a = np.arange(10)
    b = np.arange(10) * 2
    a2, b2 = batching.shuffle_arrays(rng, a, b)
    assert np.array_equal(b2, a2 * 2)
    assert not np.array_equal(a2, a)
