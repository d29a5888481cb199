"""Job logging channel (SURVEY §2.11 D7; reference
``dataQA/dailyLogger.py:1-13``: a module-level logger with a stream
handler plus a file handler, '%(asctime)s - %(name)s - %(levelname)s -
%(message)s' format, INFO level).

Rebuild difference: :func:`get_logger` is idempotent — the reference's
import-time handler wiring stacks duplicate handlers when re-imported
under schedulers that reload modules; here repeated calls return the
same configured logger without doubling output.  Executors don't use
this channel (their stdout goes to Spark's own executor logs); this is
the *driver/orchestration* log, exactly the role the reference's
``logger`` plays in ``dailyQA.py``/``dailyMain.py``.
"""

from __future__ import annotations

import logging
import os

_FORMAT = "%(asctime)s - %(name)s - %(levelname)s - %(message)s"


def get_logger(
    name: str = "pyspark_pipelining_spark",
    log_file: str | None = None,
    level: int = logging.INFO,
) -> logging.Logger:
    """Stream (+ optional file) logger matching the reference's channel."""
    logger = logging.getLogger(name)
    logger.setLevel(level)
    fmt = logging.Formatter(_FORMAT)
    if not any(
        isinstance(h, logging.StreamHandler) and not isinstance(h, logging.FileHandler)
        for h in logger.handlers
    ):
        ch = logging.StreamHandler()
        ch.setFormatter(fmt)
        logger.addHandler(ch)
    if log_file is not None:
        target = os.path.abspath(log_file)
        if not any(
            isinstance(h, logging.FileHandler) and h.baseFilename == target
            for h in logger.handlers
        ):
            fh = logging.FileHandler(target)
            fh.setFormatter(fmt)
            logger.addHandler(fh)
    return logger
