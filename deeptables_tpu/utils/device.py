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


def enable_compilation_cache(path=None):
    """Enable jax's persistent compilation cache (idempotent).

    On remote/tunneled TPU platforms a single jit compile takes minutes;
    the persistent cache makes re-runs of the same model start in
    sub-second time (measured on the tunneled v5e: 36.9 s -> 0.4 s for a
    second process).  Called automatically at package import unless the
    user configured a cache dir themselves or set DT_NO_COMPILE_CACHE=1.
    """
    if os.environ.get('DT_NO_COMPILE_CACHE') == '1':
        return None
    import jax
    try:
        current = jax.config.jax_compilation_cache_dir
    except AttributeError:  # pragma: no cover - much older jax
        return None
    if current:
        return current
    if path is None:
        home = os.environ.get('DEEPTABLES_HOME')
        base = home if home else os.path.join(
            os.path.expanduser('~'), '.cache', 'deeptables_tpu')
        path = os.path.join(base, 'jax_cache')
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', path)
        # Only on REMOTE/tunneled plugin backends store EVERY entry: with
        # remote compile jax's measured compile time excludes the tunnel
        # round-trip (0.75 s measured vs 14.7 s wall), so a >=1 s
        # threshold skips exactly the entries that are expensive to
        # recreate.  On the ordinary local backends (cpu/gpu/tpu) keep
        # jax's >=1 s default — storing thousands of sub-second entries
        # would churn the cache dir without a win there.  Remote plugins
        # are detected by an explicitly selected non-standard platform
        # name in JAX_PLATFORMS (e.g. the tunneled 'axon' PJRT plugin,
        # whose backend still reports platform 'tpu');
        # DT_COMPILE_CACHE_MIN_SECS overrides either way.
        standard = ('cpu', 'gpu', 'cuda', 'rocm', 'tpu', 'metal', '')
        plugins = os.environ.get('JAX_PLATFORMS', '').lower().split(',')
        remote_plugin = any(p.strip() not in standard for p in plugins)
        if not remote_plugin and not any(p.strip() for p in plugins):
            # no explicit platform selection: check the REGISTERED
            # backend-factory names — a tunneled plugin still registers
            # under its own name (e.g. 'axon') even though the backend
            # it creates reports the standard platform 'tpu' (verified
            # on the tunneled v5e: default_backend() == 'tpu'), so the
            # platform name alone cannot distinguish it
            try:
                from jax._src import xla_bridge as _xb
                names = set(getattr(_xb, '_backend_factories', {}))
                remote_plugin = any(str(n).lower() not in standard
                                    for n in names)
            except Exception:  # pragma: no cover - jax internals moved
                remote_plugin = False
        threshold = float(os.environ.get(
            'DT_COMPILE_CACHE_MIN_SECS',
            0.0 if remote_plugin else 1.0))
        jax.config.update('jax_persistent_cache_min_compile_time_secs',
                          threshold)
    except Exception as e:  # pragma: no cover
        logger.debug(f'compilation cache not enabled: {e}')
        return None
    return path
