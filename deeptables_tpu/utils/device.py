# -*- coding:utf-8 -*-
"""Device management helpers.

The analog of the reference's ``utils/gpu.py`` (set_memory_growth at 6,
set_memory_limit at 20).  On TPU, XLA pre-allocates HBM per process and the
knobs are env-var based; these helpers expose them plus device inventory.
``set_memory_growth`` is accepted (the config's ``gpu_usage_strategy`` field
still exists for API parity) and maps to disabling XLA preallocation.
"""

import os

from . import dt_logging

logger = dt_logging.get_logger(__name__)


def set_memory_growth():
    """Disable XLA's eager full-HBM preallocation (must run before the
    backend initializes; no-op afterwards)."""
    os.environ.setdefault('XLA_PYTHON_CLIENT_PREALLOCATE', 'false')


def set_memory_limit(fraction: float):
    """Cap the fraction of device memory this process may allocate."""
    os.environ['XLA_PYTHON_CLIENT_MEM_FRACTION'] = str(fraction)


def device_info():
    """Inventory of visible devices: platform, kind, count."""
    import jax
    devices = jax.devices()
    return {
        'platform': jax.default_backend(),
        'device_kind': devices[0].device_kind if devices else None,
        'num_devices': len(devices),
        'num_local_devices': jax.local_device_count(),
        'process_index': jax.process_index(),
        'num_processes': jax.process_count(),
    }


def memory_stats(device=None):
    """Per-device memory statistics when the backend exposes them."""
    import jax
    d = device or jax.devices()[0]
    stats = getattr(d, 'memory_stats', None)
    return stats() if callable(stats) else None
