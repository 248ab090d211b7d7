# -*- coding:utf-8 -*-
from . import embedding, initializers, interactions, losses, metrics
