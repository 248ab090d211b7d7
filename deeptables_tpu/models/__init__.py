# -*- coding:utf-8 -*-
from .config import ModelConfig
from .metainfo import (CategoricalColumn, ContinuousColumn,
                       VarLenCategoricalColumn)
from .modelset import ModelInfo, ModelSet
from .deepmodel import DeepModel, DeepTabularModel, IgnoreCaseDict, ModelDesc
from .deeptable import DeepTable, probe_evaluate
from .preprocessor import AbstractPreprocessor, DefaultPreprocessor
from . import deepnets
from .deepnets import register_custom_objects, register_nets
from .callbacks import Callback, EarlyStopping, History, ModelCheckpoint


def make_experiment(*args, **kwargs):
    """AutoML experiment entry (lazy import to keep base import light)."""
    from .hyper_dt import make_experiment as _mk
    return _mk(*args, **kwargs)
