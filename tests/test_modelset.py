# -*- coding:utf-8 -*-
import pytest

from deeptables_tpu.models import ModelInfo, ModelSet


def mi(name, auc):
    return ModelInfo('val', name, object(), {'AUC': auc})


class TestModelSet:
    def test_best_model_max(self):
        ms = ModelSet(metric='AUC', best_mode='auto')
        ms.push(mi('a', 0.7))
        ms.push(mi('b', 0.9))
        ms.push(mi('c', 0.8))
        assert ms.best_model().name == 'b'
        assert [m.name for m in ms.top_n(2)] == ['b', 'c']

    def test_best_model_min(self):
        ms = ModelSet(metric='logloss', best_mode='auto')
        ms.push(ModelInfo('val', 'a', object(), {'logloss': 0.5}))
        ms.push(ModelInfo('val', 'b', object(), {'logloss': 0.3}))
        assert ms.best_model().name == 'b'

    def test_duplicate_name(self):
        ms = ModelSet()
        ms.push(mi('a', 0.7))
        with pytest.raises(ValueError):
            ms.push(mi('a', 0.8))

    def test_score_from_history(self):
        info = ModelInfo('val', 'm', object(), {},
                         history={'AUC': [0.5, 0.8], 'loss': [1.0, 0.4]})
        assert info.get_score('auc') == 0.8
        assert info.get_score('LOSS') == 0.4

    def test_leaderboard(self):
        ms = ModelSet(metric='AUC')
        ms.push(mi('a', 0.7))
        ms.push(mi('b', 0.9))
        board = ms.leaderboard()
        assert board.shape[0] == 2
        assert '*auc' in board.columns
