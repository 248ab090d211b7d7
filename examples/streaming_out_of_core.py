# -*- coding:utf-8 -*-
"""Out-of-core training on CSV shards (the reference's Dask workflow,
TPU-native: ChunkedSource + exact two-pass streaming fit + prefetching
loader — see deeptables_tpu/data/streaming.py).

Mirrors the reference Dask notebook flow: fit statistics over the full
stream (exact, not sampled), train from the stream, evaluate from the
stream, then k-fold CV over the stream.
"""

import os
import tempfile

import numpy as np

from deeptables_tpu.data.datasets import load_bank
from deeptables_tpu.data.streaming import (ChunkedSource, StreamingDataLoader,
                                           fit_preprocessor_streaming)
from deeptables_tpu.models import DeepTable, ModelConfig
from deeptables_tpu.models.preprocessor import DefaultPreprocessor


def main():
    # ---- write some CSV shards (stand-in for a too-big-for-RAM dataset) --
    tmp = tempfile.mkdtemp(prefix='dt_stream_')
    for i in range(4):
        df = load_bank(2000, seed=100 + i)
        df.to_csv(os.path.join(tmp, f'bank_{i}.csv'), index=False)
    source = ChunkedSource(os.path.join(tmp, '*.csv'), chunk_size=1000)

    config = ModelConfig(nets=['linear', 'fm_nets', 'dnn_nets'],
                         metrics=['AUC'], embedding_dropout=0,
                         earlystopping_patience=0)

    # ---- exact streaming fit: full-stream statistics in one pass ---------
    pre = DefaultPreprocessor(config, use_cache=False)
    fit_preprocessor_streaming(pre, source, target='y')
    print(f'task={pre.task}, {len(pre.categorical_columns)} categorical, '
          f'{len(pre.get_continuous_columns())} continuous columns')

    # ---- train + evaluate from the stream --------------------------------
    train_loader = StreamingDataLoader(source, pre, target='y',
                                       batch_size=256)
    eval_loader = StreamingDataLoader(
        ChunkedSource(os.path.join(tmp, 'bank_0.csv'), chunk_size=1000),
        pre, target='y', batch_size=256, shuffle_in_chunk=False,
        drop_remainder=False)
    dt = DeepTable(config=config)
    dt.fit(train_loader, epochs=2, verbose=0)
    score = dt.evaluate(eval_loader)
    print('streaming evaluate:', {k: round(float(v), 4)
                                  for k, v in score.items()})

    # ---- k-fold CV over the stream ---------------------------------------
    dt_cv = DeepTable(config=config)
    fold_scores = dt_cv.fit_cross_validation_streaming(
        source, target='y', num_folds=3, batch_size=256, epochs=3, verbose=0)
    print('cv fold AUCs:', [round(float(s['auc']), 4) for s in fold_scores])
    assert all(np.isfinite(s['loss']) for s in fold_scores)


if __name__ == '__main__':
    main()
