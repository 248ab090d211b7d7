# -*- coding:utf-8 -*-
"""deeptables_tpu: a TPU-native (JAX/XLA/Pallas) deep-learning toolkit for
tabular data with the capabilities of DeepTables.

Public API parity with the reference's top-level exports
(``deeptables/models/__init__.py:4-9``).
"""

from ._version import __version__
from .models import (CategoricalColumn, ContinuousColumn, DeepModel,
                     DeepTable, ModelConfig, ModelInfo, ModelSet,
                     VarLenCategoricalColumn, make_experiment)
