"""Multi-host initialization (SURVEY.md sect.2 parallelism table: the
reference is single-process; the TPU-native equivalent is one global jitted
program over all hosts' devices).

On a multi-host pod slice every host runs the same program:

    from raysnail_tpu.parallel import distributed
    distributed.initialize()              # jax.distributed under the hood
    mesh = make_mesh()                    # global devices, tile x sample

With `make_mesh()` over jax.devices() (GLOBAL devices after initialize), the
shard_map render/train steps in parallel/sharding.py work unchanged: XLA
routes the sample-axis psum over ICI and keeps tile shards host-local, so
the only cross-host (DCN) traffic is the gradient all-reduce and final image
assembly. Hosts fetch their addressable shard of the framebuffer with
`jax.experimental.multihost_utils.process_allgather` (wrapped below).

This module is exercised in CI only via the single-host virtual mesh (the
driver validates the multi-chip path with xla_force_host_platform_device_count);
real pod-slice runs use the same code with no changes.
"""

from __future__ import annotations

import logging

import jax

log = logging.getLogger("raysnail")


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> int:
    """jax.distributed.initialize with env-based autodetection on TPU pods
    (all args optional there). Returns the process count. Safe to call on a
    single host: falls back to local-only."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except Exception as e:
        log.info("single-process mode (%s)", e)
    n = jax.process_count()
    log.info("distributed: %d process(es), %d global device(s)",
             n, jax.device_count())
    return n


def gather_image(local_flat):
    """All-gather per-host framebuffer shards -> full image on every host."""
    from jax.experimental import multihost_utils

    if jax.process_count() == 1:
        return local_flat
    return multihost_utils.process_allgather(local_flat)
