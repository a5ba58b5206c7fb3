"""Report shim tests (reference reporting.py:30-109 surface)."""

import os

from metrique_spark.report import Report


def test_report_builds_html(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    r = Report("t1", save_dir=str(tmp_path))
    r.add_chapter("Overview")
    r.add_section("Counts")
    r.add_text("hello <world>")
    r.add_table(df)
    path = r.write_report()
    assert os.path.exists(path)
    html_out = open(path).read()
    assert "Overview" in html_out and "chap0" in html_out
    assert "hello &lt;world&gt;" in html_out  # escaped
    assert "<table" in html_out and "name" in html_out


def test_report_table_limits_collection(spark, tmp_path):
    df = spark.range(1000).withColumnRenamed("id", "n")
    r = Report("t2", save_dir=str(tmp_path))
    r.add_table(df, limit=5)
    assert r.body.count("<tr>") <= 7  # header + 5 rows + slack
