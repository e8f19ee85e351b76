"""Platform selection helper.

The axon sitecustomize on this image sets ``jax_platforms="axon,cpu"``
programmatically at interpreter start, which silently overrides a user's
``JAX_PLATFORMS`` env var. Scripts call this to restore env-var semantics."""

from __future__ import annotations

import os

__all__ = ["apply_platform_env"]


def apply_platform_env():
    want = os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    import jax

    try:
        if jax.config.jax_platforms != want:
            jax.config.update("jax_platforms", want)
    except Exception:
        pass
