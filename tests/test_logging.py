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


def test_run_etl_emits_dataset_named_audit_trail(spark, tmp_path, caplog):
    """The lifecycle must actually USE the logging surface (reference
    parse logs its progress): transform + parse emit under the
    dataset-named logger."""
    import sys

    sys.path.insert(0, str(tmp_path.parent))  # noop; keep imports local
    from test_manager import ChirpsLike, _write_nc

    raw = tmp_path / "raw"
    raw.mkdir()
    _write_nc(str(raw / "m.nc"), 0, 5, seed=9)
    m = ChirpsLike(str(tmp_path / "tbl"))
    import datetime as dt
    import logging as _l

    with caplog.at_level(_l.INFO, logger="chirps_like"):
        m.run_etl(spark, str(raw), expected_delta=dt.timedelta(days=1))
    msgs = [r.message for r in caplog.records if r.name == "chirps_like"]
    assert any("transforming raw files" in s for s in msgs)
    assert any("parse complete" in s and "initial" in s for s in msgs)


def test_log_to_console_reuse_lowers_level_when_more_verbose():
    """ADVICE r6: log_to_console(DEBUG) after an INFO console handler
    exists must lower the reused handler (and root) to DEBUG — the
    reference's reuse path keeps INFO and silently drops DEBUG."""
    h1 = dlog.log_to_console(level=logging.INFO)
    try:
        h2 = dlog.log_to_console(level=logging.DEBUG)
        assert h2 is h1
        assert h1.level == logging.DEBUG
        assert logging.getLogger().level <= logging.DEBUG
        # and a LESS verbose re-request never raises the level back up
        h3 = dlog.log_to_console(level=logging.WARNING)
        assert h3 is h1 and h1.level == logging.DEBUG
    finally:
        dlog.remove_handler(h1)
