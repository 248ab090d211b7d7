# -*- coding:utf-8 -*-
"""Project logger factory (parity: reference utils/dt_logging.py:10-17)."""

import logging
import os

_FMT = '%(asctime)s %(levelname)s %(name)s: %(message)s'
_configured = False


def _configure_root():
    global _configured
    if _configured:
        return
    level = os.environ.get('DEEPTABLES_LOG_LEVEL', 'INFO').upper()
    handler = logging.StreamHandler()
    handler.setFormatter(logging.Formatter(_FMT))
    root = logging.getLogger('deeptables_tpu')
    if not root.handlers:
        root.addHandler(handler)
    root.setLevel(getattr(logging, level, logging.INFO))
    root.propagate = False
    _configured = True


class _Logger(logging.Logger):
    """Logger with the reference's `is_info_enabled` convenience."""

    def is_info_enabled(self):
        return self.isEnabledFor(logging.INFO)

    def is_debug_enabled(self):
        return self.isEnabledFor(logging.DEBUG)


logging.setLoggerClass(_Logger)


def get_logger(name=None):
    _configure_root()
    if name is None:
        name = 'deeptables_tpu'
    elif not name.startswith('deeptables_tpu'):
        name = f'deeptables_tpu.{name}'
    return logging.getLogger(name)
