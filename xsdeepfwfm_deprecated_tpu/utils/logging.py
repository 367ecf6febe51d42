"""Run logging: stdout + per-run file under ./logs/ (reference ``utils/util.py:22-42``)."""

from __future__ import annotations

import logging
import os
import sys

_LOGGER_NAME = "xsdeepfwfm_tpu"


def get_logger(filename: str | None = None, log_dir: str = "./logs") -> logging.Logger:
    root = logging.getLogger(_LOGGER_NAME)
    root.setLevel(logging.DEBUG)
    if not any(isinstance(h, logging.StreamHandler) and getattr(h, "stream", None) is sys.stdout
               for h in root.handlers):
        handler = logging.StreamHandler(sys.stdout)
        handler.setLevel(logging.DEBUG)
        handler.setFormatter(logging.Formatter(
            "%(asctime)s - %(name)s - %(levelname)s - %(message)s"))
        root.addHandler(handler)
    if filename:
        os.makedirs(log_dir, exist_ok=True)
        path = os.path.join(log_dir, filename + ".log")
        if not any(isinstance(h, logging.FileHandler) and h.baseFilename == os.path.abspath(path)
                   for h in root.handlers):
            fh = logging.FileHandler(filename=path)
            fh.setLevel(logging.DEBUG)
            fh.setFormatter(logging.Formatter(
                "%(asctime)s - %(name)s - %(levelname)s - %(message)s"))
            root.addHandler(fh)
    root.propagate = False
    return root
