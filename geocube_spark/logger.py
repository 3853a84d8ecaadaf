"""Package logging helpers (reference parity: geocube/logger.py —
get_logger / set_log_level / log_to_console / log_to_file; rebuilt
from scratch, no appdirs dependency).

The engine logs under the ``geocube_spark`` logger namespace (e.g.
``cube.py`` warns when a non-numeric measurement is skipped, matching
the reference's rasterize.py:111-113 warning); these helpers give
users the same knobs the reference exposes.
"""

from __future__ import annotations

import logging
import os

_LOGGER = logging.getLogger("geocube_spark")
_LOGGER.addHandler(logging.NullHandler())
_LOGGER.propagate = False
_LOGGER_FORMAT_STR = "%(levelname)s-%(name)s: %(message)s"


def get_logger() -> logging.Logger:
    """The package logger (reference geocube/logger.py:18-26)."""
    return _LOGGER


def set_log_level(level=None) -> None:
    """Set the logger level; all higher levels are logged
    (reference geocube/logger.py:29-41)."""
    if level is not None:
        _LOGGER.setLevel(level)


def _remove_log_handler(handler_type) -> None:
    for handler in list(_LOGGER.handlers):
        # exact type match: StreamHandler is FileHandler's base
        if type(handler) is handler_type:  # noqa: E721
            _LOGGER.removeHandler(handler)


def log_to_console(status: bool = True, level=None) -> None:
    """Turn console logging on/off (reference geocube/logger.py:49-70)."""
    set_log_level(level)
    if status:
        console_handler = logging.StreamHandler()
        console_handler.setFormatter(logging.Formatter(_LOGGER_FORMAT_STR))
        _LOGGER.addHandler(console_handler)
    else:
        _remove_log_handler(logging.StreamHandler)


def log_to_file(status: bool = True, filename=None, level=None) -> None:
    """Turn file logging on/off (reference geocube/logger.py:73-103).

    Default location: ``$XDG_CACHE_HOME|~/.cache/geocube_spark/logs/
    geocube_spark.log`` (the reference uses appdirs; same idea, no
    extra dependency).
    """
    set_log_level(level)
    if filename is None:
        base = os.environ.get(
            "XDG_CACHE_HOME", os.path.join(os.path.expanduser("~"), ".cache")
        )
        filename = os.path.join(
            base, "geocube_spark", "logs", "geocube_spark.log"
        )
    if status:
        os.makedirs(os.path.dirname(filename), exist_ok=True)
        file_handler = logging.FileHandler(filename)
        file_handler.setFormatter(logging.Formatter(_LOGGER_FORMAT_STR))
        _LOGGER.addHandler(file_handler)
    else:
        _remove_log_handler(logging.FileHandler)
