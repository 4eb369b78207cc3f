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
    if not plat:
        return
    import jax

    try:
        jax.config.update("jax_platforms", plat)
        return  # no backend was initialized yet: the request will be honored
    except RuntimeError:
        pass  # backend already initialized; verify below instead of passing
    # An explicit platform request that silently lands on the TPU would
    # violate the one-TPU-process rule (e.g. a JAX_PLATFORMS=cpu subprocess
    # test grabbing and wedging the chip), so verify loudly instead of
    # swallowing the failed update.  The TPU plugin here registers as 'axon'
    # but the initialized backend reports itself as 'tpu' (CLAUDE.md
    # hazards), so the strict check applies only to CPU requests — exactly
    # the case whose silent failure wedges the chip.  NOTE: reaching this
    # branch at all means some import initialized a backend early; in the
    # normal CLI flow the update above succeeds without touching the backend
    # (so jax.distributed.initialize can still run later).
    want = plat.split(",")[0].strip().lower()
    if want != "cpu":
        return
    got = jax.default_backend()
    if got != want:
        raise RuntimeError(
            f"JAX_PLATFORMS={plat!r} was requested but the active backend is "
            f"{got!r} (a backend initialized before apply_env_platform ran). "
            "Call apply_env_platform() before any other jax use."
        )
