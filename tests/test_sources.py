"""Source connector tests: file loaders, git log parsing, delta plans."""

import os

import pytest
from pyspark.sql import functions as F

from metrique_spark.sources import files, git, jdbc


def test_load_csv(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("symbol,open,close\n$AJT,17.84,18.15\n$BQX,5.0,5.5\n")
    df = files.load(spark, str(p))
    assert df.count() == 2
    assert set(df.columns) == {"symbol", "open", "close"}
    assert df.schema["open"].dataType.typeName() == "double"


def test_load_with_oid(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("sym,v\na,1\nb,2\n")
    df = files.load(spark, str(p), oid="sym")
    assert "_oid" in df.columns


def test_load_json_lines(spark, tmp_path):
    p = tmp_path / "t.json"
    p.write_text('{"a": 1, "b": "x"}\n{"a": 2, "b": "y"}\n')
    df = files.load(spark, str(p))
    assert df.count() == 2


def test_load_json_orient_index(spark, tmp_path):
    # pandas orient='index' dict-of-dicts (reference meps.json shape)
    p = tmp_path / "idx.json"
    p.write_text('{"101": {"name": "alice", "country": "AT"}, '
                 '"102": {"name": "bob", "country": "BE"}}')
    df = files.load_json(spark, str(p), orient_index=True)
    assert df.count() == 2
    assert set(df.columns) == {"_key", "name", "country"}
    keys = {r["_key"] for r in df.collect()}
    assert keys == {"101", "102"}


def test_detect_format():
    assert files.detect_format("/x/y.csv") == "csv"
    assert files.detect_format("/x/*.parquet") == "parquet"
    with pytest.raises(ValueError):
        files.detect_format("/x/unknown.xyz")


def test_git_commits(spark):
    # parse this repo's own history
    df = git.commits_from_repo(spark, "/root/repo")
    assert df.count() >= 2
    row = df.orderBy("_start").first()
    assert len(row["_oid"]) == 40
    assert "<" in row["author"]
    assert row["added"] >= 0
    assert isinstance(row["parents"], list)
    # root commit has no parents
    roots = df.where(F.size("parents") == 0)
    assert roots.count() >= 1
    # numstat produced per-file added/removed structs
    assert df.where(F.size("files") > 0).count() >= 1


def test_jdbc_delta_plans(tmp_path):
    assert jdbc.delta_plan(True, "2014-01-01") == "full"
    assert jdbc.delta_plan(False, None) == "full"
    assert jdbc.delta_plan(False, "2014-01-01") == "delta"
    assert jdbc.new_oids_predicate(42) == "_oid > 42"
    assert jdbc.new_oids_predicate("abc") == "_oid > 'abc'"
    assert (jdbc.changed_oids_predicate(["m1", "m2"], "2014-01-01")
            == "m1 >= '2014-01-01' OR m2 >= '2014-01-01'")
    cp = str(tmp_path / "cp" / "state.json")
    assert jdbc.load_checkpoint(cp) is None
    saved = jdbc.save_checkpoint(cp, "2014-06-01 00:00:00")
    assert jdbc.load_checkpoint(cp) == saved == "2014-06-01 00:00:00"


def test_multimodal_features(spark):
    from metrique_spark.functions import multimodal as mm

    media = mm.synthetic_media(spark, 30)
    feats = mm.extract_features(media)
    rows = feats.collect()
    assert len(rows) == 30
    assert all(r["checksum"] is not None for r in rows)
    assert all(r["width"] >= 64 and r["height"] >= 64 for r in rows)
    # metadata-only projection never touches payload bytes
    meta_only = media.select("media_id", "meta.bytes")
    assert meta_only.count() == 30
