"""Sharded input pipeline tests."""

import numpy as np
import pytest

from xsdeepfwfm_deprecated_tpu.data.sharded_input import (
    ShardedCsvPipeline, epoch_permutation, host_shard, shard_files)


def test_host_shard_partition():
    n = 103
    covered = []
    for h in range(4):
        s, e = host_shard(n, h, 4)
        covered.extend(range(s, e))
    assert covered == list(range(n))


def test_shard_files_round_robin():
    paths = [f"f{i}" for i in range(7)]
    got = [shard_files(paths, h, 3) for h in range(3)]
    assert sorted(sum(got, [])) == sorted(paths)
    assert got[0] == ["f0", "f3", "f6"]


def test_epoch_permutation_deterministic():
    a = epoch_permutation(100, seed=1, epoch=3)
    b = epoch_permutation(100, seed=1, epoch=3)
    c = epoch_permutation(100, seed=1, epoch=4)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


@pytest.fixture
def csv_file(tmp_path):
    rng = np.random.default_rng(0)
    rows = []
    for i in range(57):
        rows.append(",".join(
            [str(i % 2)] + [f"{rng.random():.3f}" for _ in range(3)]
            + [str(rng.integers(0, 9)) for _ in range(4)]))
    p = tmp_path / "d.csv"
    p.write_text("\n".join(rows) + "\n")
    return str(p)


def test_pipeline_reads_shard(csv_file):
    pipes = [ShardedCsvPipeline(csv_file, n_numeric=3, process_index=h,
                                process_count=2) for h in range(2)]
    assert sum(p.local_rows for p in pipes) == 57
    batches = list(pipes[0].epoch_batches(batch_size=8, seed=0, epoch=0))
    assert all(b["index"].shape == (8, 4) for b in batches)
    assert all(b["value"].shape == (8, 3) for b in batches)
    # deterministic across re-instantiation (restart)
    pipe_again = ShardedCsvPipeline(csv_file, n_numeric=3, process_index=0,
                                    process_count=2)
    batches2 = list(pipe_again.epoch_batches(batch_size=8, seed=0, epoch=0))
    for b1, b2 in zip(batches, batches2):
        np.testing.assert_array_equal(b1["index"], b2["index"])


def test_pipeline_covers_all_rows(csv_file):
    pipe = ShardedCsvPipeline(csv_file, n_numeric=3, process_index=0,
                              process_count=1)
    seen = []
    for b in pipe.epoch_batches(batch_size=10, seed=0, epoch=0,
                                drop_remainder=False):
        seen.extend(b["label"].tolist())
    assert len(seen) == 57
