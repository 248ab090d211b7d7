# -*- coding:utf-8 -*-
"""Typed column schema records passed from the preprocessor to the model
builder and the data pipeline.

Capability parity with the reference's ``deeptables/models/metainfo.py``
(CategoricalColumn at metainfo.py:33, VarLenCategoricalColumn at 52,
ContinuousColumn at 74). The auto embedding-dim rule
``round(vocabulary_size ** 0.25)`` when ``embeddings_output_dim == 0``
mirrors metainfo.py:46-47.
"""

import collections

from ..utils import consts


class CategoricalColumn(collections.namedtuple('CategoricalColumn',
                                               ['name',
                                                'vocabulary_size',
                                                'embeddings_output_dim',
                                                'dtype',
                                                'input_name',
                                                ])):
    def __hash__(self):
        return self.name.__hash__()

    def __new__(cls, name, vocabulary_size, embeddings_output_dim=10,
                dtype='int32', input_name=None):
        if input_name is None:
            input_name = consts.INPUT_PREFIX_CAT + str(name)
        if embeddings_output_dim == 0:
            embeddings_output_dim = int(round(vocabulary_size ** 0.25))
        return super(CategoricalColumn, cls).__new__(
            cls, name, vocabulary_size, embeddings_output_dim, dtype, input_name)


class VarLenCategoricalColumn(collections.namedtuple('VarLenCategoricalColumn',
                                                     ['name',
                                                      'vocabulary_size',
                                                      'embeddings_output_dim',
                                                      'dtype',
                                                      'input_name',
                                                      'sep',
                                                      'pooling_strategy',
                                                      ])):
    """A multi-valued categorical column (e.g. movie genres 'a|b|c').

    ``max_elements_length`` is a mutable attribute set by the preprocessor once
    the padded sequence length is known (reference preprocessor.py:425).
    ``pooling_strategy`` in {'max', 'avg', 'flat'} controls how the per-token
    embeddings (B, L, D) are combined into one field:

    - 'max'/'avg': masked pooling to (B, 1, D) — the TPU-friendly default which
      keeps all fields the same width;
    - 'flat': reshape to (B, 1, L*D), mirroring the reference's
      VarLenColumnEmbedding (layers.py:961).
    """

    _max_elements_lengths = {}

    def __hash__(self):
        return self.name.__hash__()

    def __new__(cls, name, vocabulary_size, embeddings_output_dim=10,
                dtype='int32', input_name=None, sep='|', pooling_strategy='max'):
        if input_name is None:
            input_name = consts.INPUT_PREFIX_CAT + str(name)
        if embeddings_output_dim == 0:
            embeddings_output_dim = int(round(vocabulary_size ** 0.25))
        return super(VarLenCategoricalColumn, cls).__new__(
            cls, name, vocabulary_size, embeddings_output_dim, dtype,
            input_name, sep, pooling_strategy)

    # namedtuples are immutable; keep the mutable max length in a side table
    # keyed by object id is fragile across pickling, so use a plain attribute
    # emulation via __dict__ on the instance (allowed for namedtuple subclass
    # instances through a class-level dict keyed by (name, voc)).
    @property
    def max_elements_length(self):
        return self.__dict__.get('_max_elements_length', None)

    @max_elements_length.setter
    def max_elements_length(self, value):
        self.__dict__['_max_elements_length'] = int(value)

    def __getstate__(self):
        return dict(self.__dict__)

    def __setstate__(self, state):
        self.__dict__.update(state)


class ContinuousColumn(collections.namedtuple('ContinuousColumn',
                                              ['name',
                                               'column_names',
                                               'input_dim',
                                               'dtype',
                                               'input_name',
                                               ])):
    def __hash__(self):
        return self.name.__hash__()

    def __new__(cls, name, column_names, input_dim=0, dtype='float32',
                input_name=None):
        input_dim = len(column_names)
        return super(ContinuousColumn, cls).__new__(
            cls, name, list(column_names), input_dim, dtype, input_name)
