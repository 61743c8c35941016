"""Platform detection: where will jitted code actually run?

No analogue in the reference — its only device decision is a bare cuda
autodetect (run.py:106-108, :332). Here the answer gates the Pallas
attention path (TPU-only; XLA fallback elsewhere)."""

from __future__ import annotations

import jax


def pallas_supported() -> bool:
    """True when the Pallas TPU kernels can compile: the default backend is a
    TPU ('axon' is the tunneled TPU platform in this environment) and the
    default device has not been pinned to CPU (the test conftest pins one)."""
    pinned = getattr(jax.config.jax_default_device, "platform", None)
    return jax.default_backend() in ("tpu", "axon") and pinned != "cpu"
