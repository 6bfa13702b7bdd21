"""Persistent XLA compilation cache (process-restart survival).

Every serving/bench/training process pays full XLA compiles otherwise; with
remote-compile TPU setups that can be minutes per executable. Call once,
early, from CLIs.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)

DEFAULT_DIR = os.environ.get(
    "KARANTA_COMPILE_CACHE",
    os.path.expanduser("~/.cache/karanta_tpu/xla_cache"))


def enable_compilation_cache(cache_dir: str = DEFAULT_DIR) -> None:
    import jax

    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        logger.info("XLA compilation cache at %s", cache_dir)
    except Exception:
        logger.exception("could not enable the XLA compilation cache")
