"""Catalog seam semantics: snapshot swap atomicity, clear vs append
lifecycle (reference: DELETE /<index> on --clear, ElasticWriter.java:186-194
vs add-to-existing, ImportEvent.java:45)."""

from __future__ import annotations

import pytest

from excelastic_spark.catalog import IndexStore


def test_overwrite_swaps_snapshot(spark, tmp_path):
    store = IndexStore(str(tmp_path), "t")
    df1 = spark.range(5).withColumnRenamed("id", "x")
    p1 = store.write_table(df1, "tab")
    assert store.read_table(spark, "tab").count() == 5
    df2 = spark.range(3).withColumnRenamed("id", "x")
    p2 = store.write_table(df2, "tab")
    assert p1 != p2  # fresh snapshot dir, never in-place
    assert store.read_table(spark, "tab").count() == 3
    # history retained in the manifest (time-travel hook)
    snaps = [s for s in store.manifest()["snapshots"] if s["table"] == "tab"]
    assert len(snaps) == 2


def test_append_unions_segments(spark, tmp_path):
    store = IndexStore(str(tmp_path), "t")
    store.write_table(spark.range(4).withColumnRenamed("id", "x"), "tab")
    store.write_table(
        spark.range(4, 10).withColumnRenamed("id", "x"), "tab", mode="append"
    )
    got = sorted(r["x"] for r in store.read_table(spark, "tab").collect())
    assert got == list(range(10))


def test_drop_clears_everything(spark, tmp_path):
    store = IndexStore(str(tmp_path), "t")
    store.write_table(spark.range(2).withColumnRenamed("id", "x"), "tab")
    store.commit_stage("s1", "fp1")
    store.drop()
    assert not store.has_table("tab")
    assert not store.stage_done("s1", "fp1")


def test_missing_table_raises(spark, tmp_path):
    store = IndexStore(str(tmp_path), "t")
    with pytest.raises(KeyError):
        store.read_table(spark, "nope")


def test_stage_fingerprint_mismatch(tmp_path):
    store = IndexStore(str(tmp_path), "t")
    store.commit_stage("build", "fp-a", n=1)
    assert store.stage_done("build", "fp-a")
    assert not store.stage_done("build", "fp-b")  # input changed -> rerun


def test_config_file_loader(tmp_path):
    """Configuration.java:31-52 analog: JSON overrides, missing-default-file
    tolerance, default-index rule."""
    import datetime
    import json

    import pytest

    from excelastic_spark.config import EngineConfig, generate_default_index

    p = tmp_path / "configuration.json"
    p.write_text(json.dumps({
        "k1": 0.9, "n_buckets": 4, "default_index": "code_idx",
        "index_lock": True, "unknown_key": 123,
    }))
    cfg = EngineConfig.load_file(str(p))
    assert cfg.k1 == 0.9 and cfg.n_buckets == 4
    assert cfg.default_index == "code_idx" and cfg.index_lock is True
    assert cfg.block_size == EngineConfig().block_size  # untouched default
    assert cfg.resolve_index_name(None) == "code_idx"
    assert cfg.resolve_index_name("cli_wins") == "cli_wins"

    # missing default-named file -> defaults (reference logs + continues)
    import os
    cwd = os.getcwd()
    os.chdir(tmp_path / "..")
    try:
        assert EngineConfig.load_file(None).k1 == EngineConfig().k1
    finally:
        os.chdir(cwd)
    # explicitly named missing file -> error
    with pytest.raises(FileNotFoundError):
        EngineConfig.load_file(str(tmp_path / "nope.json"))

    # MMMM-yyyy rule (Configuration.java:55-57)
    assert generate_default_index(datetime.date(2018, 3, 5)) == "march-2018"
    assert EngineConfig().resolve_index_name(None) == generate_default_index()
