# -*- coding:utf-8 -*-
import pickle

from deeptables_tpu.models import (CategoricalColumn, ContinuousColumn,
                                   VarLenCategoricalColumn)


class TestMetainfo:
    def test_categorical_auto_dim(self):
        c = CategoricalColumn('a', 10000, 0)
        assert c.embeddings_output_dim == round(10000 ** 0.25)
        assert c.input_name == 'cat_a'

    def test_continuous_input_dim(self):
        c = ContinuousColumn('all', ['a', 'b', 'c'])
        assert c.input_dim == 3

    def test_var_len_max_elements_length(self):
        c = VarLenCategoricalColumn('genres', 20, 4, sep='|')
        c.max_elements_length = 6
        assert c.max_elements_length == 6
        c2 = pickle.loads(pickle.dumps(c))
        assert c2.max_elements_length == 6
        assert c2.sep == '|'
