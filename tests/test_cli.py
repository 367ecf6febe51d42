"""CLI integration tests: drive the real entry points in subprocesses on the
virtual CPU platform (catches flag-wiring and end-to-end glue regressions)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FORCE_CPU = (
    "import jax; jax.config.update('jax_platforms', 'cpu'); "
)


def run_cli(module: str, args: list, timeout: int = 600):
    code = (FORCE_CPU +
            f"from xsdeepfwfm_deprecated_tpu.cli.{module} import main; "
            f"main({args!r})")
    return subprocess.run([sys.executable, "-c", code], cwd=REPO,
                          capture_output=True, text=True, timeout=timeout)


@pytest.mark.slow
def test_main_all_cli_end_to_end(tmp_path):
    out = run_cli("main_all", [
        "-dataset", "tiny-criteo", "-use_fwfm", "1", "-use_fm", "0",
        "-use_logit", "0", "-use_deep", "1", "-use_lw", "1", "-use_fwlw", "1",
        "-n_epochs", "1", "-batch_size", "2048", "-deep_nodes", "16",
        "-embedding_size", "4", "-h_depth", "2"])
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "Training [1]" in out.stdout
    assert "MODEL SIZE" in out.stdout
    assert "Avg forward pass time" in out.stdout


@pytest.mark.slow
def test_nfm_cli_end_to_end():
    out = run_cli("nfm", [
        "-dataset", "tiny-criteo", "-n_epochs", "1", "-batch_size", "2048",
        "-deep_nodes", "16", "-embedding_size", "4", "-h_depth", "2"])
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "NFM test loss" in out.stdout


@pytest.mark.slow
def test_main_all_debug_nans_flag():
    """-debug_nans 1 wires utils/debug.nan_debugging around fit: a clean run
    completes with the trap armed (no false positives), and the config flag
    actually flips jax_debug_nans inside the scope."""
    out = run_cli("main_all", [
        "-dataset", "tiny-criteo", "-use_fwfm", "1", "-use_fm", "0",
        "-use_logit", "0", "-use_deep", "1", "-use_lw", "1", "-use_fwlw", "1",
        "-n_epochs", "1", "-batch_size", "2048", "-deep_nodes", "16",
        "-embedding_size", "4", "-h_depth", "2", "-debug_nans", "1"])
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "Training [1]" in out.stdout


def test_main_all_rejects_conflicting_flags():
    out = run_cli("main_all", ["-dataset", "tiny-criteo", "-use_fm", "1",
                               "-use_fwfm", "1"])
    assert out.returncode != 0
    assert "only one of" in (out.stdout + out.stderr)
