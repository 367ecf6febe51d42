"""Offline-preprocessing tests: Criteo pipeline on synthetic raw data."""

import numpy as np
import pytest

from xsdeepfwfm_deprecated_tpu.data import preprocess as P
from xsdeepfwfm_deprecated_tpu.data import readers


def test_scale_numeric():
    # x > 2 → int(log(x)^2) (reference data/large/preprocess_criteo.py:54-60)
    assert P.scale_numeric(1) == 1
    assert P.scale_numeric(2) == 2
    assert P.scale_numeric(100) == float(int(np.log(100) ** 2))
    assert P.scale_numeric("") == 0.0


def test_frequency_maps_cutoff():
    rows = [["1", "a"], ["1", "a"], ["1", "b"], ["2", "a"], ["2", "c"]]
    maps = P.build_frequency_maps(rows, n_numeric=1, cutoff=2)
    assert maps[0] == {"a": 1}          # 'b','c' below cutoff → long tail


@pytest.fixture
def raw_criteo(tmp_path):
    """Synthetic raw tab-separated criteo: label, 13 ints, 26 cat strings."""
    rng = np.random.default_rng(0)
    lines = []
    for i in range(400):
        label = str(rng.integers(0, 2))
        nums = [str(rng.integers(0, 50)) for _ in range(13)]
        cats = [f"v{rng.integers(0, 5)}" for _ in range(26)]
        lines.append("\t".join([label] + nums + cats))
    p = tmp_path / "train.txt"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_preprocess_criteo_end_to_end(raw_criteo, tmp_path):
    out = tmp_path / "out"
    p_train, p_valid, p_test, p_map = P.preprocess_criteo(
        raw_criteo, str(out), cutoff=4, valid_test_fraction=0.2, seed=0)
    # outputs load through the standard reader with the emitted feature map
    d = readers.read_data(p_train, p_map, list(range(1, 14)),
                          feature_dim_start=1, dim=39)
    assert d["index"].shape[1] == 26
    assert d["value"].shape[1] == 13
    assert len(d["feature_sizes"]) == 39
    # every index in-bounds for the declared feature sizes
    for col in range(26):
        assert d["index"][:, col].max() < d["feature_sizes"][13 + col]
    # valid/test files exist and are disjoint halves of the tail
    n_valid = sum(1 for _ in open(p_valid))
    n_test = sum(1 for _ in open(p_test))
    assert n_valid + n_test == 80
    assert abs(n_valid - n_test) < 30
    # numeric scaling applied (values 0..50 → log² for >2)
    assert d["value"].max() <= float(int(np.log(50) ** 2)) + 2


def test_value_counts_mapping():
    import pandas as pd
    df = pd.DataFrame({"c": ["x", "x", "x", "y", "y", "z"]})
    df2, maps = P.preprocess_value_counts(df.copy(), ["c"], cutoff=2)
    assert maps["c"]["x"] == 1 and maps["c"]["y"] == 2
    assert list(df2["c"]) == [1, 1, 1, 2, 2, 0]


def test_min_max_scale():
    import pandas as pd
    df = pd.DataFrame({"a": [0.0, 5.0, 10.0]})
    out = P.min_max_scale(df.copy(), ["a"])
    np.testing.assert_allclose(out["a"], [0.0, 0.5, 1.0])


def _ali_raw_tables(n=400, seed=0):
    import pandas as pd
    rng = np.random.default_rng(seed)
    raw_sample = pd.DataFrame({
        "user": rng.integers(0, 50, n),
        "time_stamp": rng.integers(1_494_000_000, 1_494_700_000, n),
        "adgroup_id": rng.integers(0, 30, n),
        "pid": rng.choice(["430539_1007", "430548_1007"], n),
        "nonclk": 0, "clk": rng.integers(0, 2, n)})
    raw_sample["nonclk"] = 1 - raw_sample["clk"]
    ad_feature = pd.DataFrame({
        "adgroup_id": np.arange(30),
        "cate_id": rng.integers(0, 8, 30),
        "campaign_id": rng.integers(0, 12, 30),
        "customer": rng.integers(0, 9, 30),
        "brand": rng.integers(0, 6, 30).astype(float),
        "price": rng.random(30) * 1000})
    user_profile = pd.DataFrame({
        "userid": np.arange(50),
        "cms_segid": rng.integers(0, 5, 50),
        "cms_group_id": rng.integers(0, 4, 50),
        "final_gender_code": rng.integers(1, 3, 50),
        "age_level": rng.integers(0, 7, 50),
        "pvalue_level": rng.integers(1, 4, 50).astype(float),
        "shopping_level": rng.integers(1, 4, 50),
        "occupation": rng.integers(0, 2, 50),
        "new_user_class_level": rng.integers(1, 5, 50).astype(float)})
    return raw_sample, ad_feature, user_profile


def test_preprocess_ali_join(tmp_path):
    """Three-table join parity with reference data/large/ali_ad.py:18-110."""
    raw_sample, ad_feature, user_profile = _ali_raw_tables()
    out = str(tmp_path / "ali_click.csv")
    df = P.preprocess_ali_join(raw_sample, ad_feature, user_profile, out_path=out)
    # reference column order: clk, time_stamp, price (loop-insert at 1), rest
    assert list(df.columns[:3]) == ["clk", "time_stamp", "price"]
    assert "nonclk" not in df.columns
    # history echo columns copied from cate_id/adgroup_id (:88-89)
    np.testing.assert_array_equal(df["hist_cate_id"], df["cate_id"])
    np.testing.assert_array_equal(df["hist_adgroup_id"], df["adgroup_id"])
    # dense min-max scaled to [0, 1] (:101-103)
    for col in ("price", "time_stamp"):
        assert 0.0 <= df[col].min() and df[col].max() <= 1.0
    # inner-join semantics: every row's user/ad attributes present
    assert len(df) == len(raw_sample)      # all keys exist in the dim tables
    assert not df.isna().any().any()
    # CSV written header-less
    import pandas as pd
    back = pd.read_csv(out, header=None)
    assert back.shape == df.shape


def test_preprocess_ali_cli_end_to_end(tmp_path):
    """join → map stages produce reader-loadable ali_{train,valid,test}.csv."""
    import subprocess
    import sys as _sys
    raw_sample, ad_feature, user_profile = _ali_raw_tables()
    raw_dir = tmp_path / "raw"
    raw_dir.mkdir()
    raw_sample.to_csv(raw_dir / "raw_sample.csv", index=False)
    ad_feature.to_csv(raw_dir / "ad_feature.csv", index=False)
    user_profile.to_csv(raw_dir / "user_profile.csv", index=False)
    out = tmp_path / "out"
    env = {"PYTHONPATH": ".", "JAX_PLATFORMS": "cpu"}
    import os as _os
    env = {**_os.environ, **env}
    r = subprocess.run([_sys.executable, "scripts/preprocess_ali.py", "join",
                        str(raw_dir / "raw_sample.csv"), str(raw_dir / "ad_feature.csv"),
                        str(raw_dir / "user_profile.csv"), str(out)],
                       capture_output=True, text=True, env=env, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    r = subprocess.run([_sys.executable, "scripts/preprocess_ali.py", "map",
                        str(out / "ali_click.csv"), str(out),
                        "--n-dense", "2", "--no-header", "--sample-frac", "1.0"],
                       capture_output=True, text=True, env=env, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    # the mapped split loads through the standard reader + emitted feature map
    n_fields = 2 + 17   # time_stamp, price + 17 categorical columns post-join
    d = readers.read_data(str(out / "ali_train.csv"), str(out / "ali_feature_map"),
                          list(range(1, 3)), feature_dim_start=1, dim=n_fields)
    assert d["index"].shape[1] == 17
    assert d["value"].shape[1] == 2
    for col in range(17):
        assert d["index"][:, col].max() < d["feature_sizes"][2 + col]


def test_preprocess_twitter_end_to_end(tmp_path):
    import pandas as pd
    rng = np.random.default_rng(0)
    n = 300
    df = pd.DataFrame({
        "reply": rng.integers(0, 2, n), "retweet": rng.integers(0, 2, n),
        "retweet_comment": rng.integers(0, 2, n), "like": rng.integers(0, 2, n),
        "d0": rng.random(n) * 100, "d1": rng.random(n) * 5,
        "s0": rng.integers(0, 4, n).astype(str), "s1": rng.integers(0, 3, n).astype(str),
    })
    tr, va, te, maps = P.preprocess_twitter(
        df, dense_features=["d0", "d1"], sparse_features=["s0", "s1"],
        cutoff=2, out_dir=str(tmp_path))
    assert len(tr) + len(va) + len(te) == n
    assert tr["d0"].max() <= 1.0 and tr["d0"].min() >= 0.0
    assert set(np.unique(tr["s0"])) <= set(range(10))
    # reader contract: loads back through read_data_twitter
    from xsdeepfwfm_deprecated_tpu.data.readers import read_data_twitter
    d = read_data_twitter(str(tmp_path / "twitter_train_s.parquet"),
                          str(tmp_path / "twitter_feature_map_s"),
                          num_list=[1, 2], feature_dim_start=4, dim=4,
                          twitter_category="like")
    assert d["value"].shape[1] == 2
    assert d["index"].shape[1] == 2
