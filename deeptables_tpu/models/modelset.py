# -*- coding:utf-8 -*-
"""Named model registry with per-metric leaderboard.

Capability parity with ``deeptables/models/modelset.py`` (ModelInfo at 8,
ModelSet at 36): scores scraped from the last epoch of a fit history,
auto min/max ordering by metric name, leaderboard DataFrame with the sort
metric starred.
"""

import numpy as np
import pandas as pd

from ..utils import consts


class ModelInfo:
    def __init__(self, type, name, model, score, **meta):
        self.type = type
        self.name = name
        self.model = model
        self.score = self._lower_keys(score)
        self.meta = meta

        if len(self.score) <= 0 and meta.get('history') is not None:
            history = meta['history']
            self.score = {str(k).lower(): history[k][-1]
                          for k in history.keys()}

    @staticmethod
    def _lower_keys(d):
        if d is None:
            return {}
        return {str(k).lower(): v for k, v in d.items()}

    def get_score(self, metric_name):
        score = self.score.get(str(metric_name).lower())
        return 0 if score is None else score


class ModelSet:
    def __init__(self, metric=consts.METRIC_NAME_AUC,
                 best_mode=consts.MODEL_SELECT_MODE_MAX):
        self.best_mode = best_mode
        self.metric = str(metric).lower()
        self.__models = []

    def clear(self):
        self.__models = []

    def push(self, modelinfo):
        if self.get_modelinfo(modelinfo.name) is not None:
            raise ValueError(
                f'Duplicate model name is not allowed, model named '
                f'"{modelinfo.name}" already exists.')
        self.__models.append(modelinfo)

    def get_modelinfo(self, name):
        for mi in self.__models:
            if mi.name == name:
                return mi
        return None

    def best_model(self):
        if len(self.__models) <= 0:
            raise ValueError('Model set is empty.')
        self.__sort()
        return self.__models[0]

    def get_models(self, type=None):
        return [m.model for m in self.get_modelinfos(type)]

    def get_modelinfos(self, type=None):
        if type is not None:
            return [m for m in self.__models if m.type == type]
        return list(self.__models)

    def top_n(self, top=0, type=None):
        self.__sort()
        models = self.get_modelinfos(type=type)
        if top <= 0:
            top = len(models)
        return models[:top]

    def leaderboard(self, top=0, type=None):
        models = self.top_n(top, type=type)
        rows = []
        for m in models:
            df = pd.DataFrame(
                np.array(list(m.score.values())).reshape(1, -1))
            keys = list(m.score.keys())
            try:
                index = keys.index(self.metric)
                keys[index] = '*' + self.metric
            except ValueError:
                print(f'Not found sort-metric:{self.metric} '
                      f'in metrics:{keys}.')
            df.columns = keys
            df.insert(0, 'type', [m.type])
            df.insert(0, 'model', [m.name])
            rows.append(df)
        if len(rows) <= 0:
            return None
        board = pd.concat(rows, axis=0).reset_index(drop=True)
        return board

    def __sort(self):
        best_mode = self.best_mode
        if best_mode == consts.MODEL_SELECT_MODE_AUTO:
            if self.metric.lower() in consts.METRICS_BIGGER_IS_BETTER:
                best_mode = consts.MODEL_SELECT_MODE_MAX
            else:
                best_mode = consts.MODEL_SELECT_MODE_MIN
        reverse = best_mode == consts.MODEL_SELECT_MODE_MAX
        self.__models.sort(key=lambda x: x.get_score(self.metric),
                           reverse=reverse)
