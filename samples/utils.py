"""Shared sample helpers (logging + default asset path).

Analog of the reference's samples/utils.py logging setup.
"""

import logging
import os
import pathlib

if os.environ.get("VPF_TPU_FORCE_CPU") == "1":
    # The environment's sitecustomize registers (and pins) the TPU
    # backend at interpreter startup, so a plain JAX_PLATFORMS=cpu in the
    # spawning env does NOT take — the test harness would silently drive
    # every sample through the TPU link. Both steps are required (see
    # tests/conftest.py): the env var for late importers, the config
    # update because jax is already imported by sitecustomize.
    os.environ["JAX_PLATFORMS"] = "cpu"
    try:
        import jax

        jax.config.update("jax_platforms", "cpu")
    except Exception:  # pragma: no cover - jax-less environments
        pass


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
