# -*- coding:utf-8 -*-
"""Smoke-train sanity check (parity: reference utils/quicktest.py:12-16)."""

import numpy as np
import pandas as pd


def test():
    from ..models import deepnets, deeptable
    X = pd.DataFrame(np.random.random((100, 4)))
    y = pd.Series(np.random.randint(0, 2, 100))
    dt = deeptable.DeepTable(deeptable.ModelConfig(nets=deepnets.DeepFM))
    dt.fit(X, y, verbose=0)
    return dt


if __name__ == '__main__':
    test()
