"""Native C++ latency simulator: build + ctypes binding smoke tests."""

import shutil

import pytest

from xsdeepfwfm_deprecated_tpu.serving import native_latency as NL

pytestmark = pytest.mark.skipif(shutil.which("make") is None or shutil.which("g++") is None,
                                reason="native toolchain unavailable")


def test_latency_models_ordering():
    """Dense DeepFwFM must cost more than its parts; CSR @10% beats dense."""
    lr = NL.latency_ms("lr", iters=50)
    fwfm = NL.latency_ms("fwfm", iters=50)
    dense = NL.latency_ms("deepfwfm", iters=50)
    sparse10 = NL.latency_ms("deepfwfm_sparse", density=0.1, iters=50)
    assert lr < fwfm < dense
    assert sparse10 < 0.5 * dense, (sparse10, dense)


def test_batched_throughput_positive():
    assert NL.batched_throughput(batch=64, iters=2) > 0


def test_sparsity_sweep_shape():
    sweep = NL.sparsity_sweep(densities=(0.2, 0.05), iters=20)
    assert set(sweep) == {0.2, 0.05}
    assert all(v > 0 for v in sweep.values())


def test_thread_sweep_mt():
    """1-vs-4-thread 8192-batch rows (reference model/DeepFMs.py:982-997):
    both counts produce positive throughput and MT is not pathologically
    slower than single-thread."""
    from xsdeepfwfm_deprecated_tpu.serving import native_latency as nl

    sweep = nl.thread_sweep(batch=2048, iters=2, threads=(1, 4))
    assert set(sweep) == {1, 4}
    assert sweep[1] > 0 and sweep[4] > 0
    # shared CI silicon: only require MT not be catastrophically worse
    assert sweep[4] > 0.5 * sweep[1], sweep
