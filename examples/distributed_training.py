# -*- coding:utf-8 -*-
"""Multi-chip training: data parallelism + row-sharded embedding tables.

The same code runs on 1 chip, on a v5e pod slice, or on the virtual CPU
mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python examples/distributed_training.py
"""

import jax

from deeptables_tpu.datasets import dsutils
from deeptables_tpu.models import DeepTable, ModelConfig
from deeptables_tpu.parallel import DataAndModelParallel, DataParallel


def main():
    n = len(jax.devices())
    print(f'{n} devices: {jax.devices()[:4]}...')

    df = dsutils.load_criteo_synthetic(50_000)
    y = df.pop('label')

    if n >= 2 and n % 2 == 0:
        # 2-way model parallelism: large embedding tables row-shard across
        # the model axis; XLA emits the gather collectives.
        strategy = DataAndModelParallel(data_parallel=n // 2,
                                        model_parallel=2)
        emb_strategy = 'sharded'
    else:
        strategy = DataParallel()
        emb_strategy = 'replicated'

    conf = ModelConfig(
        nets=['linear', 'fm_nets', 'dnn_nets'], metrics=['AUC'],
        distribute_strategy=strategy,
        embedding_device_strategy=emb_strategy,
        dtype_policy='bfloat16')
    dt = DeepTable(config=conf)
    model, history = dt.fit(df, y, epochs=3, batch_size=4096)
    print('val AUC:', history.history['val_auc'][-1])


if __name__ == '__main__':
    main()
