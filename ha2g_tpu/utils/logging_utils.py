"""Logging + seeding utilities (reference train_utils.py:37-46, 216-221)."""

from __future__ import annotations

import logging
import os
import random
import sys
from logging.handlers import RotatingFileHandler
from pathlib import Path

import numpy as np


def set_logger(log_path: str | None = None, log_filename: str = "log") -> None:
    handlers = [logging.StreamHandler(sys.stdout)]
    if log_path is not None:
        Path(log_path).mkdir(parents=True, exist_ok=True)
        handlers.append(RotatingFileHandler(
            os.path.join(log_path, f"{log_filename}.log"),
            maxBytes=10 * 1024 * 1024, backupCount=5))
    logging.basicConfig(level=logging.DEBUG, format="%(asctime)s: %(message)s",
                        handlers=handlers, force=True)


def set_random_seed(seed: int) -> None:
    """Host-side RNG seeding; device randomness flows through explicit
    jax.random keys derived from the seed in the training loop."""
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
