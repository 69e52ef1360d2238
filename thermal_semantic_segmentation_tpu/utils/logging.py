"""Timestamped file logger (utils/misc.py:357-367 capability)."""

from __future__ import annotations

import datetime
import logging
import os


def get_logger(logdir: str, name: str = "tss_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    os.makedirs(logdir, exist_ok=True)
    ts = str(datetime.datetime.now()).split(".")[0]
    ts = ts.replace(" ", "_").replace(":", "_").replace("-", "_")
    handler = logging.FileHandler(os.path.join(logdir, f"run_{ts}.log"))
    handler.setFormatter(logging.Formatter("%(asctime)s %(levelname)s %(message)s"))
    logger.addHandler(handler)
    logger.setLevel(logging.INFO)
    return logger
