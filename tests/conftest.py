# -*- coding:utf-8 -*-
"""Test configuration: run JAX on a virtual 8-device CPU mesh so multi-chip
sharding paths are exercised without TPU hardware (the analog of the
reference's in-process Dask cluster for 'distributed' tests, SURVEY.md §4)."""

import os

os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ.setdefault('DEEPTABLES_HOME', '/tmp/dt_test_home')
os.environ.setdefault('DEEPTABLES_LOG_LEVEL', 'WARNING')

import jax  # noqa: E402

# the env's TPU plugin overrides JAX_PLATFORMS; the config flag wins.
jax.config.update('jax_platforms', 'cpu')
# numeric oracle tests compare against float64 numpy; the backend default
# matmul precision emulates the TPU MXU's bf16 inputs — pin full f32 here.
jax.config.update('jax_default_matmul_precision', 'highest')
