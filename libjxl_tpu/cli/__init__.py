"""Command-line tools (reference ``tools/``)."""

import os


def apply_platform_env() -> None:
    """Honor ``JAX_PLATFORMS`` even when a sitecustomize hook imported
    jax before the environment variable could take effect (jax reads it
    at import time). Called by every CLI entry point so
    ``JAX_PLATFORMS=cpu python -m libjxl_tpu.cli.cjxl ...`` reliably
    stays off the accelerator."""
    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    try:
        import jax
        if jax.config.jax_platforms != plat:
            jax.config.update("jax_platforms", plat)
    except Exception:  # noqa: BLE001  (jax absent or already initialized)
        pass
