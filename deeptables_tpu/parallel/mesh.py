# -*- coding:utf-8 -*-
"""Device mesh & sharding strategies.

The reference's only multi-device path is a ``tf.distribute.Strategy``
pass-through (deepmodel.py:88-103) with tf.data auto-sharding.  The
TPU-native replacement (SURVEY.md §2.2/§5) is a ``jax.sharding.Mesh`` over
ICI/DCN with NamedShardings: batches sharded over the ``data`` axis, params
replicated (dense towers) or row-sharded over the ``model`` axis (large
embedding tables).  XLA inserts the collectives (psum for grads under jit,
all-gather/reduce-scatter as needed) — there is no NCCL-style call site.

``DataParallel`` / ``DataAndModelParallel`` objects plug into
``ModelConfig.distribute_strategy`` the same way a tf Strategy did.
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..utils import dt_logging

logger = dt_logging.get_logger(__name__)

DATA_AXIS = 'data'
MODEL_AXIS = 'model'


def build_mesh(data_parallel: Optional[int] = None,
               model_parallel: int = 1,
               devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    With a single device this yields a 1×1 mesh — the same code path runs
    from one chip to a pod slice.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if model_parallel <= 0:
        model_parallel = 1
    if data_parallel is None:
        data_parallel = n // model_parallel
    if data_parallel * model_parallel > n:
        raise ValueError(
            f'Mesh {data_parallel}x{model_parallel} needs '
            f'{data_parallel * model_parallel} devices but only {n} available.')
    use = np.asarray(devices[:data_parallel * model_parallel]).reshape(
        data_parallel, model_parallel)
    return Mesh(use, (DATA_AXIS, MODEL_AXIS))


class DistributionStrategy:
    """Base strategy: shardings for batch / params / embedding tables."""

    def __init__(self, mesh: Optional[Mesh] = None):
        self._mesh = mesh

    @property
    def mesh(self) -> Mesh:
        if self._mesh is None:
            self._mesh = self.build_default_mesh()
        return self._mesh

    def build_default_mesh(self) -> Mesh:
        return build_mesh()

    # -- shardings ---------------------------------------------------------
    @property
    def batch_sharding(self):
        return NamedSharding(self.mesh, P(DATA_AXIS))

    @property
    def replicated(self):
        return NamedSharding(self.mesh, P())

    @property
    def table_sharding(self):
        """Sharding for embedding tables (rows over the model axis)."""
        return NamedSharding(self.mesh, P())

    @property
    def num_data_shards(self):
        return self.mesh.shape[DATA_AXIS]

    def shard_batch(self, batch: dict):
        """Place a host batch dict onto the mesh, sharded on the data axis."""
        sh = self.batch_sharding
        return {k: jax.device_put(v, sh) for k, v in batch.items()}

    def replicate(self, tree):
        sh = self.replicated
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)

    # pickling support: strategies hold device handles which must not be
    # pickled (the reference strips tf strategies the same way,
    # deeptable.py:756-771).
    def __getstate__(self):
        state = dict(self.__dict__)
        state['_mesh'] = None
        return state


class DataParallel(DistributionStrategy):
    """Pure data parallelism: batch sharded over all devices, params
    replicated.  Gradients are psum-reduced by XLA automatically."""

    def __init__(self, num_devices: Optional[int] = None, mesh=None):
        super().__init__(mesh)
        self.num_devices = num_devices

    def build_default_mesh(self):
        return build_mesh(data_parallel=self.num_devices, model_parallel=1)


class DataAndModelParallel(DistributionStrategy):
    """Data parallelism + row-sharded embedding tables over the model axis.

    Use together with ``ModelConfig.embedding_device_strategy='sharded'``;
    tables whose row count exceeds ``shard_threshold`` are partitioned across
    the model axis and looked up with masked local gathers + psum
    (see parallel/sharded_embedding.py).
    """

    def __init__(self, data_parallel: Optional[int] = None,
                 model_parallel: int = 1, mesh=None,
                 shard_threshold: int = 0):
        super().__init__(mesh)
        self.data_parallel = data_parallel
        self.model_parallel = model_parallel
        self.shard_threshold = shard_threshold

    def build_default_mesh(self):
        return build_mesh(data_parallel=self.data_parallel,
                          model_parallel=self.model_parallel)

    @property
    def table_sharding(self):
        return NamedSharding(self.mesh, P(MODEL_AXIS))


def get_strategy(config_strategy) -> DistributionStrategy:
    """Resolve ModelConfig.distribute_strategy to a strategy instance."""
    if config_strategy is None:
        return DataParallel(num_devices=1)
    if isinstance(config_strategy, DistributionStrategy):
        return config_strategy
    if isinstance(config_strategy, str):
        if config_strategy in ('data', 'data_parallel', 'mirrored'):
            return DataParallel()
        raise ValueError(f'Unknown distribute_strategy: {config_strategy!r}')
    raise ValueError(
        f'[distribute_strategy] must be a DistributionStrategy, got '
        f'{type(config_strategy)}')
