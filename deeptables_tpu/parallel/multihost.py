# -*- coding:utf-8 -*-
"""Multi-host (pod-slice) initialization helpers.

On a TPU pod slice every host runs the same program; JAX needs
``jax.distributed.initialize()`` before first use so all hosts join one
runtime.  This module wraps that with environment detection and provides
the per-host data-sharding facts the input pipeline needs
(``ChunkedSource(host_id=..., num_hosts=...)``).
"""

import os

from ..utils import dt_logging

logger = dt_logging.get_logger(__name__)

_initialized = False


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None):
    """Join the multi-host JAX runtime (no-op on a single host).

    On Cloud TPU the arguments are auto-detected; elsewhere pass
    coordinator_address ('host:port'), num_processes and process_id, or set
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID.
    """
    global _initialized
    if _initialized:
        return host_info()
    import jax
    coordinator_address = coordinator_address or \
        os.environ.get('JAX_COORDINATOR_ADDRESS')
    if num_processes is None and os.environ.get('JAX_NUM_PROCESSES'):
        num_processes = int(os.environ['JAX_NUM_PROCESSES'])
    if process_id is None and os.environ.get('JAX_PROCESS_ID'):
        process_id = int(os.environ['JAX_PROCESS_ID'])

    if coordinator_address or num_processes or \
            os.environ.get('TPU_WORKER_HOSTNAMES'):
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
        logger.info(f'joined distributed runtime: process '
                    f'{jax.process_index()}/{jax.process_count()}')
    _initialized = True
    return host_info()


def host_info():
    """(host_id, num_hosts, local_device_count) for data sharding."""
    import jax
    return {
        'host_id': jax.process_index(),
        'num_hosts': jax.process_count(),
        'local_device_count': jax.local_device_count(),
        'global_device_count': jax.device_count(),
    }


def per_host_batch(global_batch_size: int) -> int:
    """Rows each host must feed per step for a given global batch."""
    import jax
    n = jax.process_count()
    if global_batch_size % n != 0:
        raise ValueError(
            f'global batch {global_batch_size} must divide {n} hosts')
    return global_batch_size // n
