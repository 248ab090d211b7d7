# -*- coding:utf-8 -*-
"""Checkpointing utilities.

Two formats:

- **msgpack** (default, used by ``DeepModel.save``): single-file flax
  serialization — simple, portable, right for replicated single-host params
  (the analog of the reference's h5 files).
- **orbax** directory checkpoints: sharding-aware async-capable saves for
  row-sharded embedding tables on multi-host meshes, where gathering the
  full table to one host (what msgpack requires) is infeasible.
"""

import os

from . import dt_logging

logger = dt_logging.get_logger(__name__)


def save_orbax(path, variables, force=True):
    """Save a (possibly sharded) variable tree as an orbax checkpoint."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, variables, force=force)
    ckptr.wait_until_finished()
    return path


def restore_orbax(path, template=None, shardings=None):
    """Restore an orbax checkpoint.

    ``template`` (a matching pytree of arrays/ShapeDtypeStructs) restores
    with the template's shardings — pass the freshly-initialized (and
    mesh-placed) variables to restore row-sharded tables shard-local.
    """
    import jax
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype,
                                           sharding=getattr(x, 'sharding',
                                                            None)),
            template)
        return ckptr.restore(path, abstract)
    return ckptr.restore(path)
