"""Logging setup (reference ``logger/logger.py`` + ``logger_config.json``):
console + rotating ``info.txt`` file handler."""

from __future__ import annotations

import logging
import logging.handlers
import os
from typing import Optional


def setup_logging(
    log_dir: Optional[str] = None,
    console_level: int = logging.DEBUG,
    file_level: int = logging.INFO,
    max_bytes: int = 10 * 1024 * 1024,
    backup_count: int = 20,
) -> None:
    root = logging.getLogger()
    root.setLevel(logging.DEBUG)
    # idempotent: drop handlers from any previous setup (stale rotating-file
    # handlers would write into removed run dirs)
    for h in list(root.handlers):
        root.removeHandler(h)
        try:
            h.close()
        except Exception:
            pass
    fmt = logging.Formatter("%(asctime)s - %(name)s - %(levelname)s - %(message)s")

    console = logging.StreamHandler()
    console.setLevel(console_level)
    console.setFormatter(logging.Formatter("%(message)s"))
    root.addHandler(console)

    # orbax/absl emit very chatty INFO during async checkpoint saves;
    # matplotlib/h5py/TF flood DEBUG at import (matplotlib alone prints ~40
    # font-manager lines into the training console)
    for noisy in ("absl", "jax", "matplotlib", "h5py", "PIL", "tensorflow"):
        logging.getLogger(noisy).setLevel(logging.WARNING)

    if log_dir is not None:
        os.makedirs(log_dir, exist_ok=True)
        fh = logging.handlers.RotatingFileHandler(
            os.path.join(log_dir, "info.txt"), maxBytes=max_bytes, backupCount=backup_count
        )
        fh.setLevel(file_level)
        fh.setFormatter(fmt)
        root.addHandler(fh)


def get_logger(name: str, verbosity: int = logging.DEBUG) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(verbosity)
    return logger
