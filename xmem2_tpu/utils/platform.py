"""Make the JAX_PLATFORMS environment variable authoritative.

Some environments install a sitecustomize that imports jax at interpreter
startup and force-updates `jax_platforms` (e.g. to a tunneled TPU platform),
silently overriding the caller's JAX_PLATFORMS env var. CLI entry points call
`honor_jax_platforms_env()` first so `JAX_PLATFORMS=cpu python eval.py ...`
really runs on CPU (tests/conftest.py applies the same correction for the
test suite)."""

import os


def honor_jax_platforms_env() -> None:
    plats = os.environ.get('JAX_PLATFORMS')
    if not plats:
        return
    import jax

    jax.config.update('jax_platforms', plats)
