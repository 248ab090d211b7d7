# -*- coding:utf-8 -*-
"""Pallas TPU kernels for the hot interaction ops."""
