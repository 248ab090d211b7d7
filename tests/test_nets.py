# -*- coding:utf-8 -*-
"""Every net alone + all together + presets + custom nets (mirrors
reference tests/models/nets_test.py)."""

import numpy as np
import pytest

from deeptables_tpu.data.datasets import load_bank
from deeptables_tpu.models import DeepTable, ModelConfig, deepnets

ALL_NETS = ['linear', 'cin_nets', 'fm_nets', 'afm_nets', 'opnn_nets',
            'ipnn_nets', 'pnn_nets', 'dnn_nets', 'cross_nets',
            'cross_dnn_nets', 'dcn_nets', 'autoint_nets', 'fg_nets',
            'fgcnn_cin_nets', 'fgcnn_fm_nets', 'fgcnn_afm_nets',
            'fgcnn_ipnn_nets', 'fgcnn_dnn_nets', 'fibi_nets',
            'fibi_dnn_nets']


@pytest.fixture(scope='module')
def data():
    df = load_bank(500)
    y = df.pop('y')
    return df, y


def run_nets(nets, df, y, **conf_kw):
    conf = ModelConfig(nets=nets, metrics=['AUC'], embedding_dropout=0,
                       fixed_embedding_dim=True, embeddings_output_dim=4,
                       earlystopping_patience=0,
                       cin_params={'cross_layer_size': (8, 8)}, **conf_kw)
    dt = DeepTable(config=conf)
    _, history = dt.fit(df, y, epochs=1, batch_size=128, verbose=0)
    assert 'val_auc' in history.history
    return dt


@pytest.mark.parametrize('net', ALL_NETS)
def test_each_net_alone(net, data):
    df, y = data
    run_nets([net], df, y)


def test_all_nets_together(data):
    df, y = data
    run_nets(ALL_NETS, df, y)


@pytest.mark.parametrize('preset', ['DeepFM', 'xDeepFM', 'WideDeep', 'DCN',
                                    'AutoInt', 'PNN', 'AFM', 'FiBiNet'])
def test_presets(preset, data):
    df, y = data
    run_nets(getattr(deepnets, preset), df, y)


def test_custom_net(data):
    df, y = data
    from flax import linen as nn

    def my_custom_net(embeddings, flatten_emb_layer, dense_layer,
                      concat_emb_dense, config, model_desc):
        out = nn.Dense(10, name='custom_dense')(concat_emb_dense)
        model_desc.add_net('custom', tuple(concat_emb_dense.shape),
                           tuple(out.shape))
        return out

    dt = run_nets(['linear', my_custom_net], df, y)
    proba = dt.predict_proba(df.head(50))
    assert proba.shape == (50, 2)


def test_custom_net_bad_signature():
    def bad_net(embeddings):
        return None

    with pytest.raises(ValueError, match='Signature'):
        deepnets.register_nets(bad_net)


def test_custom_dnn_fn(data):
    df, y = data
    run_nets(['dnn_nets'], df, y,
             dnn_params={'hidden_units': ((16, 0.1, True), (8, 0, False)),
                         'activation': 'relu',
                         'custom_dnn_fn': deepnets.custom_dnn_D_A_D_B})


def test_stacking_concat(data):
    df, y = data
    run_nets(['linear', 'fm_nets', 'dnn_nets'], df, y, stacking_op='concat')


class TestSingleColumnEdgeCases:
    """Nets needing >=2 embedding fields must skip or fail cleanly with a
    single categorical column (mirrors nets_test.py:166-189)."""

    @pytest.fixture(scope='class')
    def single_cat(self):
        rng = np.random.default_rng(0)
        import pandas as pd
        df = pd.DataFrame({'c': rng.choice(list('abcdef'), 400),
                           'n': rng.normal(size=400)})
        y = pd.Series(rng.choice(['p', 'q'], 400))
        return df, y

    @pytest.mark.parametrize('net', ['linear', 'fm_nets', 'dnn_nets',
                                     'autoint_nets', 'cross_nets',
                                     'cin_nets'])
    def test_net_with_one_categorical(self, net, single_cat):
        df, y = single_cat
        run_nets([net], df, y)

    @pytest.mark.parametrize('net', ['afm_nets', 'ipnn_nets', 'opnn_nets',
                                     'pnn_nets'])
    def test_pairwise_nets_skip_to_error(self, net, single_cat):
        df, y = single_cat
        # a single embedding field -> the net returns None -> no logits
        with pytest.raises(ValueError, match='Unexpected logit output'):
            run_nets([net], df, y)


def test_custom_objects_save_load_roundtrip(data, tmp_path):
    """Save a model built with a custom net + custom_dnn_fn, clear the
    registries, assert load fails loudly, then re-register (via the
    custom_objects kwarg) and assert identical predictions (parity with
    reference tests/models/nets_test.py:141-164)."""
    df, y = data
    from flax import linen as nn
    from deeptables_tpu.models import DeepTable as DT

    def my_roundtrip_net(embeddings, flatten_emb_layer, dense_layer,
                         concat_emb_dense, config, model_desc):
        out = nn.Dense(6, name='rt_custom_dense')(concat_emb_dense)
        model_desc.add_net('rt_custom', tuple(concat_emb_dense.shape),
                           tuple(out.shape))
        return out

    def my_dnn_fn(x, params, cellname):
        return nn.Dense(12, name=f'{cellname}_d1')(nn.relu(
            nn.Dense(24, name=f'{cellname}_d0')(x)))

    dt = run_nets(['linear', my_roundtrip_net, 'dnn_nets'], df, y,
                  dnn_params={'custom_dnn_fn': my_dnn_fn})
    proba_before = dt.predict_proba(df.head(64))
    path = str(tmp_path / 'custom_dt')
    dt.save(path)

    deepnets.custom_nets.pop('my_roundtrip_net', None)
    deepnets.dt_custom_objects.pop('my_roundtrip_net', None)
    deepnets.dt_custom_objects.pop('my_dnn_fn', None)

    with pytest.raises(ValueError, match='custom'):
        DT.load(path)

    dt2 = DT.load(path, custom_objects={'my_roundtrip_net': my_roundtrip_net,
                                        'my_dnn_fn': my_dnn_fn})
    proba_after = dt2.predict_proba(df.head(64))
    np.testing.assert_allclose(proba_before, proba_after, rtol=1e-5)

    # cleanup so other tests see a pristine registry
    deepnets.custom_nets.pop('my_roundtrip_net', None)
    deepnets.dt_custom_objects.pop('my_roundtrip_net', None)
    deepnets.dt_custom_objects.pop('my_dnn_fn', None)
