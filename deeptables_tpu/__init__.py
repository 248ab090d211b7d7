# -*- coding:utf-8 -*-
"""deeptables_tpu: a TPU-native (JAX/XLA/Pallas) deep-learning toolkit for
tabular data with the capabilities of DeepTables.

Public API parity with the reference's top-level exports
(``deeptables/models/__init__.py:4-9``).
"""

from ._version import __version__

# persistent XLA compilation cache (huge win on remote/tunneled TPUs where
# one compile takes minutes; no-op if the user configured their own dir,
# opt out with DT_NO_COMPILE_CACHE=1)
from .utils.device import enable_compilation_cache as _enable_cache
_enable_cache()
del _enable_cache
from .models import (CategoricalColumn, ContinuousColumn, DeepModel,
                     DeepTable, ModelConfig, ModelInfo, ModelSet,
                     VarLenCategoricalColumn, make_experiment)
