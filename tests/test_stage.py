"""Staging-root resolution: the cluster-real contract from the r7 verdict
— an explicitly configured shared-filesystem root must be honored (conf
over env over tempdir fallback), with per-session isolation under it."""

import os

from awscommunityday_2025_iceberg_snowfalke_spark import stage as stage_mod
from awscommunityday_2025_iceberg_snowfalke_spark.stage import stage


def _forget_session_root(spark):
    """Drop the cached root so the next stage() call re-resolves it."""
    with stage_mod._LOCK:
        stage_mod._DIRS.pop(spark, None)
        stage_mod._DIRS_STRONG.pop(id(spark), None)


def test_stage_honors_env_root(spark, tmp_path):
    shared = tmp_path / "shared-fs"
    shared.mkdir()
    _forget_session_root(spark)
    os.environ["SPARK_GRAFT_STAGE_DIR"] = str(shared)
    try:
        df = stage(spark.range(0, 10))
        assert df.count() == 10
        files = df.inputFiles()
        assert files and all(str(shared) in f for f in files), files
        # per-session subdir (concurrent sessions must not collide)
        sub = os.listdir(shared)
        assert len(sub) == 1 and sub[0].startswith("sparkgraft-stage-")
    finally:
        del os.environ["SPARK_GRAFT_STAGE_DIR"]
        _forget_session_root(spark)


def test_stage_conf_overrides_env(spark, tmp_path):
    conf_root = tmp_path / "conf-root"
    env_root = tmp_path / "env-root"
    conf_root.mkdir()
    env_root.mkdir()
    _forget_session_root(spark)
    os.environ["SPARK_GRAFT_STAGE_DIR"] = str(env_root)
    spark.conf.set("spark.graft.stageDir", str(conf_root))
    try:
        df = stage(spark.range(0, 5))
        files = df.inputFiles()
        assert files and all(str(conf_root) in f for f in files), files
        assert not os.listdir(env_root)
    finally:
        spark.conf.unset("spark.graft.stageDir")
        del os.environ["SPARK_GRAFT_STAGE_DIR"]
        _forget_session_root(spark)


def test_stage_default_falls_back_to_tempdir(spark):
    _forget_session_root(spark)
    df = stage(spark.range(0, 5))
    files = df.inputFiles()
    assert files and all("sparkgraft-stage-" in f for f in files), files
    _forget_session_root(spark)
