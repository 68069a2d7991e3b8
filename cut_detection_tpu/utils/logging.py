"""Logging setup shared by every CLI.

The reference configures stdlib logging independently in each script with
one shared format string (segment_video.py:14-17, supervised_training.py:13-16,
learn_contrasts.py:14-17); here it is one helper.
"""

from __future__ import annotations

import logging

LOG_FORMAT = (
    "[%(asctime)s] %(levelname)s [%(name)s.%(funcName)s:%(lineno)d] %(message)s"
)


def setup_logging(level: str = "INFO") -> None:
    logging.basicConfig(level=level, format=LOG_FORMAT)
