"""Platform selection shim.

This environment's sitecustomize force-registers the TPU backend and the
``JAX_PLATFORMS`` env var alone is ignored; the supported override is
``jax.config.update("jax_platforms", ...)`` before any backend initializes.
The CLIs call :func:`apply_env_platform` first so ``JAX_PLATFORMS=cpu
python train_wavenet.py ...`` behaves as upstream JAX documents (used by
tests that drive the CLIs as subprocesses, and handy for debugging off-TPU).
"""

import os


def apply_env_platform():
    plat = os.environ.get("JAX_PLATFORMS", "")
    if plat:
        import jax

        try:
            jax.config.update("jax_platforms", plat)
        except RuntimeError:
            pass  # backend already initialized; keep whatever exists
