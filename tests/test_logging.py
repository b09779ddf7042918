"""Per-dataset logging surface (reference utils/logging.py parity):
handler setup, idempotent re-attach, formatting, named-logger routing,
and teardown."""

from __future__ import annotations

import logging

from gridded_etl_tools_spark.functions import logging as dlog


class _Mgr(dlog.DatasetLogging):
    dataset_name = "logtest_ds"


def test_log_to_file_writes_and_is_idempotent(tmp_path):
    path = tmp_path / "etl.log"
    h1 = _Mgr.log_to_file(path=path, level=logging.INFO)
    try:
        before = len(logging.getLogger().handlers)
        h2 = _Mgr.log_to_file(path=path, level=logging.INFO)
        assert h2 is h1  # re-attach returns the existing handler
        assert len(logging.getLogger().handlers) == before
        _Mgr.info("initial publish committed")
        _Mgr.debug("below level - must not appear")
        h1.flush()
        text = path.read_text()
        assert "initial publish committed" in text
        assert "<logtest_ds" in text  # dataset-named logger, not root
        assert "below level" not in text
    finally:
        dlog.remove_handler(h1)
    assert h1 not in logging.getLogger().handlers


def test_log_to_file_default_path_uses_dataset_name(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    h = _Mgr.log_to_file(level=logging.WARNING)
    try:
        assert h.baseFilename.endswith("logs/logtest_ds_WARNING.log")
        _Mgr.warning("cadence gap detected")
        h.flush()
        assert "cadence gap detected" in (
            tmp_path / "logs" / "logtest_ds_WARNING.log"
        ).read_text()
    finally:
        dlog.remove_handler(h)


def test_log_to_console_reuses_existing_stream_handler():
    h1 = dlog.log_to_console(level=logging.INFO)
    try:
        h2 = dlog.log_to_console(level=logging.INFO)
        assert h2 is h1
    finally:
        dlog.remove_handler(h1)


def test_separate_levels_get_separate_file_handlers(tmp_path):
    info = _Mgr.log_to_file(path=tmp_path / "a.log", level=logging.INFO)
    errs = _Mgr.log_to_file(path=tmp_path / "a.log", level=logging.ERROR)
    try:
        assert info is not errs  # same path, different level => distinct
    finally:
        dlog.remove_handler(info)
        dlog.remove_handler(errs)


def test_manager_inherits_logging_surface(tmp_path):
    from gridded_etl_tools_spark.manager import DatasetManager

    assert hasattr(DatasetManager, "log_to_file")
    assert hasattr(DatasetManager, "log_to_console")
    assert hasattr(DatasetManager, "info")
