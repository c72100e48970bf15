"""Shared sample helpers (logging + default asset path).

Analog of the reference's samples/utils.py logging setup.
"""

import logging
import os
import pathlib


def get_logger(name: str) -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(
            logging.Formatter("%(asctime)s %(name)s [%(levelname)s] %(message)s")
        )
        logger.addHandler(handler)
    logger.setLevel(os.environ.get("VPF_TPU_LOGLEVEL", "INFO"))
    return logger


def default_input() -> str:
    return str(
        pathlib.Path(__file__).parent.parent / "tests" / "assets" / "test.mp4"
    )
