"""Backend resolution across machine-image variants.

Some images register the TPU through the experimental 'axon' PJRT plugin
and preset JAX_PLATFORMS=axon; others expose the same chip natively as
'tpu' while the stale axon env var remains (the plugin's sitecustomize
swallows its own registration failure by design).  Trusting the env var
therefore breaks on half the images — probe instead: if the requested
platform list cannot initialize, fall back to jax's own auto-choice
(tpu > cpu).
"""

from __future__ import annotations

import os


def ensure_backend() -> str:
    """Initialize jax on the best available backend; return its name."""
    import jax

    if "axon" in os.environ.get("JAX_PLATFORMS", ""):
        try:
            jax.devices()
        except RuntimeError:
            # axon plugin absent on this image; cpu/tpu registered fine
            jax.config.update("jax_platforms", "")
    jax.devices()
    return jax.default_backend()
