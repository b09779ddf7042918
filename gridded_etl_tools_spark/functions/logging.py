"""Per-dataset logging surface (reference parity:
``gridded_etl_tools/utils/logging.py`` — the ``Logging`` mixin's
``log_to_file`` / ``log_to_console`` / ``default_log_path`` /
``log``/``info``/``debug``/``warning``/``error`` convenience layer).

Semantics carried over from the reference (studied, not copied):

* Handlers attach to the ROOT logger, so one call captures this
  library's statements AND any underlying module that logs through
  the stdlib without its own handler.
* Idempotent attach: if an equivalent handler is already on the root
  logger (same file path + level for files; any stdout/stderr stream
  handler at a sufficient level for console), its formatter is updated
  and the existing handler is returned — repeated setup never causes
  duplicate log lines.
* File handlers are ``WatchedFileHandler`` so external log rotation
  (logrotate mv + create) is picked up without restarting the ETL.
* The default file path is ``./logs/{dataset_name}_{LEVEL}.log`` and
  per-dataset messages log under the dataset's named logger so lines
  carry the dataset name rather than "root".

Spark note: these handlers live on the DRIVER.  Executor-side Python
(pandas UDFs) inherits Spark's own worker logging; per-record logging
in the data plane would serialize the hot path, so the contract here is
driver-side ETL audit logging, exactly the reference's usage.
"""

from __future__ import annotations

import logging
import logging.handlers
import pathlib
import sys

#: ISO-style timestamp, matching the reference's "%Y/%m/%d %H:%M" default.
DEFAULT_TIME_FORMAT = "%Y/%m/%d %H:%M"
DEFAULT_FILE_FORMAT = (
    "%(asctime)s <%(name)s in %(threadName)s> %(levelname)-8s %(message)s"
)
DEFAULT_CONSOLE_FORMAT = (
    "%(levelname)-8s <%(name)s in %(threadName)s> %(message)s"
)


def default_log_path(dataset_name: str, level: int = logging.INFO) -> pathlib.Path:
    """``./logs/{dataset_name}_{LEVEL}.log``, creating ``./logs`` if
    needed (reference ``default_log_path``)."""
    logs = pathlib.Path("logs")
    logs.mkdir(mode=0o777, exist_ok=True)
    return logs / f"{dataset_name}_{logging.getLevelName(level)}.log"


def log_to_file(
    dataset_name: str,
    path: str | pathlib.Path | None = None,
    level: int = logging.INFO,
    log_format: str = DEFAULT_FILE_FORMAT,
    time_format: str = DEFAULT_TIME_FORMAT,
) -> logging.Handler:
    """Attach (or re-use) a root-logger ``WatchedFileHandler`` writing
    ``level``-or-higher statements to ``path`` (default:
    :func:`default_log_path`).  Returns the handler so callers can
    detach it later with :func:`remove_handler`."""
    if path is None:
        path = default_log_path(dataset_name, level)
    target = pathlib.Path(path).resolve()
    formatter = logging.Formatter(log_format, time_format)
    root = logging.getLogger()
    for handler in root.handlers:
        if (
            isinstance(handler, logging.handlers.WatchedFileHandler)
            and handler.level == level
            and pathlib.Path(handler.baseFilename).resolve() == target
        ):
            handler.setFormatter(formatter)
            return handler
    handler = logging.handlers.WatchedFileHandler(str(path))
    handler.setFormatter(formatter)
    handler.setLevel(level)
    root.addHandler(handler)
    _open_root_level(root, level)
    return handler


def log_to_console(
    level: int = logging.INFO,
    log_format: str = DEFAULT_CONSOLE_FORMAT,
) -> logging.Handler:
    """Attach (or re-use) a root-logger ``StreamHandler`` writing to the
    console (stderr, the stdlib default).  An existing stdout/stderr
    handler is re-used with updated formatting; when the request is MORE
    verbose than the matched handler (e.g. log_to_console(DEBUG) after an
    INFO handler exists), the handler and root-logger levels are lowered
    so the requested statements actually flow — the reference's reuse
    path keeps the old level, which silently drops them (ADVICE r6)."""
    formatter = logging.Formatter(log_format)
    root = logging.getLogger()
    for handler in root.handlers:
        if getattr(handler, "stream", None) in (sys.stderr, sys.stdout):
            handler.setFormatter(formatter)
            if handler.level > level:
                handler.setLevel(level)
            _open_root_level(root, level)
            return handler
    handler = logging.StreamHandler()
    handler.setFormatter(formatter)
    handler.setLevel(level)
    root.addHandler(handler)
    _open_root_level(root, level)
    return handler


def _open_root_level(root: logging.Logger, level: int) -> None:
    """Lower the root LOGGER level to ``level`` if it currently filters
    more aggressively — otherwise statements below WARNING (the stdlib
    default) would be dropped before any attached handler sees them.
    Handlers keep their own per-handler level filters."""
    if root.level == logging.NOTSET or root.level > level:
        root.setLevel(level)


def remove_handler(handler: logging.Handler) -> None:
    """Detach ``handler`` from the root logger and close it — the
    teardown half the reference leaves to the caller."""
    logging.getLogger().removeHandler(handler)
    handler.close()


class DatasetLogging:
    """Mixin giving a manager class the reference's classmethod logging
    surface; requires a ``dataset_name`` class attribute."""

    dataset_name: str | None = None

    @classmethod
    def log_to_file(cls, path=None, level: int = logging.INFO, **fmt):
        return log_to_file(cls.dataset_name or cls.__name__, path, level, **fmt)

    @classmethod
    def log_to_console(cls, level: int = logging.INFO, **fmt):
        return log_to_console(level, **fmt)

    @classmethod
    def default_log_path(cls, level: int = logging.INFO) -> pathlib.Path:
        return default_log_path(cls.dataset_name or cls.__name__, level)

    @classmethod
    def log(cls, message: str, level: int = logging.INFO, **kwargs) -> None:
        """Log under the DATASET-NAMED logger so statements carry the
        dataset name instead of "root" (reference ``Logging.log``)."""
        logging.getLogger(cls.dataset_name or cls.__name__).log(
            level, message, **kwargs
        )

    @classmethod
    def debug(cls, message: str, **kwargs) -> None:
        cls.log(message, logging.DEBUG, **kwargs)

    @classmethod
    def info(cls, message: str, **kwargs) -> None:
        cls.log(message, logging.INFO, **kwargs)

    @classmethod
    def warning(cls, message: str, **kwargs) -> None:
        cls.log(message, logging.WARNING, **kwargs)

    @classmethod
    def error(cls, message: str, **kwargs) -> None:
        cls.log(message, logging.ERROR, **kwargs)
