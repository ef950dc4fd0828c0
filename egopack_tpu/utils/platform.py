"""Honor the ``JAX_PLATFORMS`` environment variable in CLI processes.

This image's sitecustomize force-registers the remote 'axon' TPU plugin, and
setting ``JAX_PLATFORMS`` in the environment alone does NOT override it — the
value must be replayed into ``jax.config`` before the first jax use
(CLAUDE.md environment rules; tests/conftest.py does the same for pytest).
Without this, CLI subprocesses (sweep children, the verify recipe, multihost
workers) that ask for ``JAX_PLATFORMS=cpu`` silently run against the
tunneled TPU, making "hermetic" runs tunnel-speed-dependent.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)


def apply_env_platform() -> None:
    """Replay ``JAX_PLATFORMS`` into jax.config (no-op when unset; warns when
    jax backends are already initialized, because ``config.update`` then
    succeeds silently while the cached backends keep the old platform)."""
    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    import jax

    try:  # private API — probe defensively so a jax bump can't break the CLIs
        from jax._src import xla_bridge
        initialized = xla_bridge.backends_are_initialized()
    except (ImportError, AttributeError):
        initialized = False
    if initialized:
        logger.warning("JAX_PLATFORMS=%s set but jax backends are already "
                       "initialized; keeping the active platform", plat)
        return
    jax.config.update("jax_platforms", plat)
