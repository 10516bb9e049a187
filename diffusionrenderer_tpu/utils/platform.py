"""Runtime platform detection.

This build environment reaches its TPU through the experimental 'axon'
PJRT tunnel, which has two quirks real TPU runtimes don't:

* executions running longer than some tens of seconds are killed by the
  remote worker, so long denoise trajectories must be dispatched in short
  segments (pipeline.max_steps_per_dispatch);
* device buffers are reclaimed asynchronously, so a large generation right
  after another can see RESOURCE_EXHAUSTED although the memory is logically
  free (pipeline drain-and-retry).

Both workarounds are gated on is_axon() so real TPU deployments run
unfragmented single-program trajectories with no retry path.
"""

from __future__ import annotations

import functools

import jax


@functools.lru_cache(maxsize=1)
def is_axon() -> bool:
    """True when the default backend is the axon PJRT tunnel."""
    try:
        dev = jax.devices()[0]
        version = getattr(dev.client, "platform_version", "")
        # The tunnel has reported itself as 'axon <ver>' and as a multi-line
        # 'PJRT C API\naxon <ver>; ...' string across runtime updates; match
        # the token anywhere.
        return "axon" in version.lower()
    except Exception:
        return False


@functools.lru_cache(maxsize=1)
def is_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False
