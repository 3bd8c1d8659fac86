"""Centralized logging configuration.

Re-owns the reference's loguru-through-tqdm setup (reference:
spine_vision/core/logging.py:10-49) with the standard library, since loguru is
not part of this framework's dependency set. Provides:

- ``setup_logger(verbose)``: console handler routed through ``tqdm.write`` so
  progress bars are not broken by log lines.
- ``add_file_log(path)``: rotating file sink (10 MB, like the reference).
- module-level ``logger`` used across the package.
"""

from __future__ import annotations

import logging
import sys
from logging.handlers import RotatingFileHandler
from pathlib import Path

logger = logging.getLogger("spine_vision_tpu")
logger.propagate = False

_CONSOLE_FORMAT = "%(asctime)s | %(levelname)-8s | %(message)s"
_FILE_FORMAT = "%(asctime)s | %(levelname)-8s | %(name)s:%(lineno)d | %(message)s"
_DATE_FORMAT = "%H:%M:%S"


class _TqdmHandler(logging.Handler):
    """Console handler that writes through tqdm when available.

    ``tqdm.write`` clears active progress bars before printing, so log lines
    never corrupt bar rendering (same behavior the reference achieves by
    routing loguru through ``tqdm.write``).
    """

    def emit(self, record: logging.LogRecord) -> None:
        try:
            msg = self.format(record)
            try:
                from tqdm import tqdm

                tqdm.write(msg, file=sys.stderr)
            except Exception:
                sys.stderr.write(msg + "\n")
        except Exception:
            self.handleError(record)


def setup_logger(verbose: bool = False) -> None:
    """Configure the package logger with a tqdm-safe console handler.

    Args:
        verbose: If True, set log level to DEBUG; otherwise INFO.
    """
    level = logging.DEBUG if verbose else logging.INFO

    # Remove existing console handlers (idempotent re-setup)
    for handler in list(logger.handlers):
        if isinstance(handler, _TqdmHandler):
            logger.removeHandler(handler)

    handler = _TqdmHandler()
    handler.setFormatter(logging.Formatter(_CONSOLE_FORMAT, datefmt=_DATE_FORMAT))
    handler.setLevel(level)
    logger.addHandler(handler)
    logger.setLevel(logging.DEBUG)


def add_file_log(
    log_path: Path | str | None = None,
    log_filename: str = "spine_vision_tpu.log",
) -> None:
    """Add a rotating file sink (10 MB per file, 5 backups).

    Args:
        log_path: Directory for log files. Defaults to ``cwd/logs``.
        log_filename: Name of the log file.
    """
    if log_path is None:
        log_path = Path.cwd() / "logs"
    log_path = Path(log_path)
    log_path.mkdir(parents=True, exist_ok=True)

    handler = RotatingFileHandler(
        log_path / log_filename,
        maxBytes=10 * 1024 * 1024,
        backupCount=5,
        encoding="utf-8",
    )
    handler.setFormatter(
        logging.Formatter(_FILE_FORMAT, datefmt="%Y-%m-%d %H:%M:%S")
    )
    handler.setLevel(logging.DEBUG)
    logger.addHandler(handler)
    logger.info("Logging to %s", log_path)


# Default setup so importing modules can log immediately.
if not logger.handlers:
    setup_logger(verbose=False)
