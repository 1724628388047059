from __future__ import annotations

import os

from peskas_mozambique_data_pipeline_spark.config import load_dotenv, read_config

CFG = """
default:
  storage:
    zone_dir: /data/zones
    codec: lz4
  kobo:
    token: ${KOBO_TOKEN:-missing}
  thresholds:
    max_catch_kg: 50
production:
  storage:
    zone_dir: gs://bucket/zones
"""


def test_read_config_env_overlay_and_secrets(tmp_path, monkeypatch):
    p = tmp_path / "config.yml"
    p.write_text(CFG)
    monkeypatch.setenv("KOBO_TOKEN", "sekret")
    cfg = read_config(str(p), environment="production")
    assert cfg["storage"]["zone_dir"] == "gs://bucket/zones"
    assert cfg["storage"]["codec"] == "lz4"  # inherited from default
    assert cfg["kobo"]["token"] == "sekret"
    assert cfg["thresholds"]["max_catch_kg"] == 50


def test_read_config_default_fallback(tmp_path, monkeypatch):
    p = tmp_path / "config.yml"
    p.write_text(CFG)
    monkeypatch.delenv("KOBO_TOKEN", raising=False)
    cfg = read_config(str(p))
    assert cfg["storage"]["zone_dir"] == "/data/zones"
    assert cfg["kobo"]["token"] == "missing"  # ${VAR:-default}


def test_load_dotenv(tmp_path, monkeypatch):
    monkeypatch.delenv("DEMO_SECRET", raising=False)
    env = tmp_path / ".env"
    env.write_text('DEMO_SECRET="abc123"\n# comment\n')
    load_dotenv(str(env))
    assert os.environ["DEMO_SECRET"] == "abc123"
    os.environ.pop("DEMO_SECRET", None)


def test_registry_window_invariants():
    """The driver hard-verifies the FIRST 50 registry entries; the
    rotation must keep never/least-recently-verified queries inside
    that window and only multiply-green queries outside it."""
    from peskas_mozambique_data_pipeline_spark import registry

    names = list(registry.SPARK_QUERIES)
    window = set(names[: registry._DRIVER_WINDOW])
    # everything explicitly prioritized is inside the driver window
    assert set(registry._VERIFY_FIRST) <= window
    # everything rotated out is exactly the declared tail
    assert names[registry._DRIVER_WINDOW:] == registry._VERIFY_LAST
    # oracle keys mirror the query keys in the same order
    assert list(registry.ORACLE_SQL) == names
