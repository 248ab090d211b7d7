# -*- coding:utf-8 -*-
import pytest

from deeptables_tpu.models import ModelConfig, deepnets


class TestModelConfig:
    def test_defaults(self):
        conf = ModelConfig()
        assert conf.nets == ('dnn_nets',)
        assert conf.metrics == ('accuracy',)
        assert conf.embeddings_output_dim == 4
        assert conf.fixed_embedding_dim is True
        assert conf.stacking_op == 'add'

    def test_first_metric_name(self):
        assert ModelConfig(metrics=['AUC']).first_metric_name == 'AUC'

        def r2_c(y_true, y_pred):
            return 0.0

        assert ModelConfig(metrics=[r2_c]).first_metric_name == 'r2_c'
        with pytest.raises(ValueError):
            _ = ModelConfig(metrics=[]).first_metric_name

    def test_replace(self):
        conf = ModelConfig(name='a')
        conf2 = conf._replace(name='b', embeddings_output_dim=8)
        assert conf2.name == 'b'
        assert conf2.embeddings_output_dim == 8
        assert conf.name == 'a'

    def test_nets_normalization(self):
        def my_net(embeddings, flatten_emb_layer, dense_layer,
                   concat_emb_dense, config, model_desc):
            return None

        conf = ModelConfig(nets=['linear', my_net])
        assert 'my_net' in conf.nets
        assert 'my_net' in deepnets.custom_nets

    def test_var_len_validation(self):
        with pytest.raises(ValueError):
            ModelConfig(var_len_categorical_columns=[('genres', '|')])
        with pytest.raises(ValueError):
            ModelConfig(var_len_categorical_columns=[('g', '|', 'max')],
                        exclude_columns=['g'])
        conf = ModelConfig(var_len_categorical_columns=[('g', '|', 'max')])
        assert conf.var_len_categorical_columns[0][0] == 'g'

    def test_preset_nets(self):
        conf = ModelConfig(nets=deepnets.DeepFM)
        assert set(conf.nets) == {'linear', 'fm_nets', 'dnn_nets'}
