"""CLI entry points (train/test/detect/export).

Honors JAX_PLATFORMS before JAX initializes a backend: the axon TPU
plugin registers itself regardless of the env var, so a subprocess
caller that exports JAX_PLATFORMS=cpu (the test suite's resume drill,
CI boxes without a chip) silently got the TPU otherwise — forcing a
platform requires BOTH the env var and the jax.config pin (see
tests/conftest.py).
"""

import os


def _honor_platform_env():
    plat = os.environ.get("JAX_PLATFORMS")
    if not plat or "," in plat:
        return
    try:
        import jax

        jax.config.update("jax_platforms", plat)
    except Exception:
        pass  # backend already initialized (in-process caller) — keep it


_honor_platform_env()
