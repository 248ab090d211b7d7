# -*- coding:utf-8 -*-
"""Extract intermediate-layer outputs and probe them with linear models
(mirrors the reference's layer-output-extraction notebook: DeepTable.apply
at deeptable.py:599 and probe_evaluate at deeptable.py:861-897).

``apply`` returns the activations of named taps from the pure forward
function; ``probe_evaluate`` trains a LogisticRegression probe per tap to
measure how linearly separable each representation is.
"""

from sklearn.model_selection import train_test_split

from deeptables_tpu.datasets import dsutils
from deeptables_tpu.models import DeepTable, ModelConfig
from deeptables_tpu.models.deeptable import probe_evaluate


def main():
    df = dsutils.load_adult(n_rows=3000)
    y = df.pop(14)  # adult ships without headers; column 14 is the label
    X_train, X_test, y_train, y_test = train_test_split(
        df, y, test_size=0.3, random_state=42)

    conf = ModelConfig(nets=['dnn_nets'], metrics=['AUC'],
                       earlystopping_patience=3)
    dt = DeepTable(config=conf)
    dt.fit(X_train, y_train, epochs=5, batch_size=256)

    # 1) raw activations of named layers for the first rows
    taps = dt.apply(X_test.head(100),
                    output_layers=['flatten_embeddings', 'dnn_dense_1'])
    for name, arr in zip(['flatten_embeddings', 'dnn_dense_1'], taps):
        print(f'{name}: shape {arr.shape}')

    # 2) optional dimensionality reduction through a transformer (the
    #    reference notebook uses t-SNE; any fit_transform object works)
    try:
        from sklearn.manifold import TSNE
        emb2d = dt.apply(X_test.head(200), output_layers=['flatten_embeddings'],
                         transformer=TSNE(n_components=2, init='random',
                                          perplexity=20))
        print('t-SNE projection:', emb2d.shape)
    except Exception as e:  # environments without a working TSNE backend
        print('t-SNE skipped:', e)

    # 3) linear probes per layer
    scores = probe_evaluate(dt, X_train, y_train, X_test, y_test,
                            layers=['flatten_embeddings', 'dnn_dense_1'])
    print('probe accuracy per layer:', scores)


if __name__ == '__main__':
    main()
