"""Layered-settings tests (reference parity: etl/hybrid_settings.py —
ini defaults, .env overrides, real env wins, validated log level)."""

import pytest

from retail_sales_analysis_etl_bi_project_spark.config import Settings, load_settings


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return p


def test_ini_defaults_with_inline_comments(tmp_path):
    _write(
        tmp_path,
        "config.ini",
        "[DEFAULT]\n"
        "data_path = data                ; raw CSVs\n"
        "staging_path = data/staging\n"
        "log_level = info\n"
        "[etl]\n"
        "batch_size = 7000\n"
        "[spark]\n"
        "shuffle_partitions = 8\n",
    )
    s = load_settings(tmp_path, environ={})
    assert s.data_path == "data"  # inline comment stripped
    assert s.staging_path == "data/staging"
    assert s.log_level == "INFO"  # validator upper-cases
    assert s.batch_size == 7000
    assert s.shuffle_partitions == 8
    assert s.warehouse_path == "warehouse/gold"  # coded default survives


def test_env_file_overrides_ini_and_env_var_wins(tmp_path):
    _write(tmp_path, "config.ini", "[DEFAULT]\nstaging_path = from_ini\n")
    _write(tmp_path, ".env", "STAGING_PATH=from_env_file\nBATCH_SIZE=123\n")
    s = load_settings(tmp_path, environ={})
    assert s.staging_path == "from_env_file"
    assert s.batch_size == 123
    s = load_settings(tmp_path, environ={"STAGING_PATH": "from_process_env"})
    assert s.staging_path == "from_process_env"


def test_invalid_log_level_raises(tmp_path):
    _write(tmp_path, "config.ini", "[DEFAULT]\nlog_level = verbose\n")
    with pytest.raises(ValueError, match="LOG_LEVEL"):
        load_settings(tmp_path, environ={})


def test_defaults_without_files(tmp_path):
    s = load_settings(tmp_path, environ={})
    assert s == Settings()
