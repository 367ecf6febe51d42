"""Native C++ CSV loader (native/dataloader) vs the numpy reference path.

The loader is the data-layer native component (SURVEY §2 #15's ingest side):
it must produce bit-identical arrays to the Python readers it accelerates
(reference ``utils/data_preprocess.py:54-117`` semantics).
"""

import os

import numpy as np
import pytest

from xsdeepfwfm_deprecated_tpu.data import native_loader, readers

TINY = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "data", "tiny_train_input.csv")


@pytest.fixture(scope="module")
def lib_ok():
    if not native_loader.available():
        pytest.skip("native loader not built")


def test_tiny_criteo_parity(lib_ok):
    label, value, index = native_loader.read_csv_arrays(TINY, list(range(1, 14)))
    data = np.loadtxt(TINY, delimiter=",")
    np.testing.assert_array_equal(label, data[:, 0].astype(np.float32))
    np.testing.assert_array_equal(value, data[:, 1:14].astype(np.float32))
    np.testing.assert_array_equal(index, data[:, 14:].astype(np.int32))


def test_header_floats_and_unterminated_tail(lib_ok, tmp_path):
    """Non-numeric header skipped (reference 'y2' check, :73); float cells and
    scientific notation parsed; final line without trailing newline kept."""
    p = tmp_path / "mixed.csv"
    p.write_text("y2,a,b,c,d\n1,2.5,3,4,5\n0,-1.25e1,7,8,9\n1,0.5,1,2,3")
    label, value, index = native_loader.read_csv_arrays(str(p), [1])
    np.testing.assert_array_equal(label, [1, 0, 1])
    np.testing.assert_allclose(value[:, 0], [2.5, -12.5, 0.5])
    np.testing.assert_array_equal(index, [[3, 4, 5], [7, 8, 9], [1, 2, 3]])


def test_read_data_native_equals_numpy(lib_ok, monkeypatch):
    """readers.read_data gives identical batches with the loader on and off."""
    native = readers.read_data(TINY, None, list(range(1, 14)))
    monkeypatch.setenv("XSDEEPFWFM_NATIVE_LOADER", "0")
    plain = readers.read_data(TINY, None, list(range(1, 14)))
    assert native["feature_sizes"] == plain["feature_sizes"]
    for k in ("label", "value", "index"):
        np.testing.assert_array_equal(native[k], plain[k])


def test_read_data_ali_native_equals_numpy(lib_ok, tmp_path, monkeypatch):
    emb = tmp_path / "emb"
    emb.write_text("".join(f"{f},v{i},{i}\n" for f in range(2, 4) for i in range(3)))
    p = tmp_path / "ali.csv"
    p.write_text("y2,x,a,b\n1,0.5,1.0,2.0\n0,1.5,0.0,1.0\n")
    native = readers.read_data_ali(str(p), str(emb), [1],
                                   feature_dim_start=1, dim=3)
    monkeypatch.setenv("XSDEEPFWFM_NATIVE_LOADER", "0")
    plain = readers.read_data_ali(str(p), str(emb), [1],
                                  feature_dim_start=1, dim=3)
    assert native["feature_sizes"] == plain["feature_sizes"]
    for k in ("label", "value", "index"):
        np.testing.assert_array_equal(native[k], plain[k])


def test_large_indices_exact(lib_ok, tmp_path):
    """Categorical indices above 2^24 must survive exactly (an all-float parse
    would round 16777217 -> 16777216 — the reference uses exact int(item),
    utils/data_preprocess.py:64)."""
    p = tmp_path / "big.csv"
    p.write_text("1,0.5,16777217,99999999\n0,1.5,2147483647,33554433\n")
    label, value, index = native_loader.read_csv_arrays(str(p), [1])
    np.testing.assert_array_equal(index, [[16777217, 99999999],
                                          [2147483647, 33554433]])


def test_malformed_rows_raise(lib_ok, tmp_path):
    """Short rows and unparseable cells raise (fall back to strict numpy)
    instead of silently zero-filling."""
    short = tmp_path / "short.csv"
    short.write_text("1,0.5,3,4\n0,1.5,7\n")          # ragged second row
    with pytest.raises(IOError):
        native_loader.read_csv_arrays(str(short), [1])
    garbled = tmp_path / "garbled.csv"
    garbled.write_text("1,0.5,3,4\n0,1.5,x7,8\n")     # non-numeric cell
    with pytest.raises(IOError):
        native_loader.read_csv_arrays(str(garbled), [1])


def test_read_data_skip_header_bypasses_native(lib_ok, tmp_path):
    """skip_header=True must not route through the native loader (a NUMERIC
    header row would pass its first-cell check and be ingested as data)."""
    p = tmp_path / "numhdr.csv"
    p.write_text("0,1,2,3\n1,0.5,3,4\n0,1.5,7,8\n")   # numeric 'header' row
    batch = readers.read_data(str(p), None, [1], skip_header=True)
    assert batch["label"].shape == (2,)
    np.testing.assert_array_equal(batch["label"], [1, 0])


def test_throughput_counts_rows(lib_ok, tmp_path):
    """Loader handles a wide file with many rows; row count exact."""
    rng = np.random.default_rng(0)
    data = np.concatenate([rng.integers(0, 2, (5000, 1)),
                           rng.integers(0, 100, (5000, 13)),
                           rng.integers(0, 50000, (5000, 26))], axis=1)
    p = tmp_path / "wide.csv"
    np.savetxt(p, data, fmt="%d", delimiter=",")
    label, value, index = native_loader.read_csv_arrays(str(p), list(range(1, 14)))
    assert label.shape == (5000,) and value.shape == (5000, 13)
    np.testing.assert_array_equal(index, data[:, 14:].astype(np.int32))
