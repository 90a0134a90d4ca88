"""End-to-end CLI coverage: every subcommand, in-process (the session
fixture is reused via getOrCreate)."""

from __future__ import annotations

import json
import os
import zipfile

from datacanary_spark.cli import main


def test_gen_pages_and_filter_and_resume(spark, tmp_path, capsys):
    pages = str(tmp_path / "pages")
    out = str(tmp_path / "out")
    assert main(["gen-pages", "--output", pages, "--docs", "120",
                 "--files", "4"]) == 0
    assert main(["filter", "--input", pages, "--output", out,
                 "--chunks", "2"]) == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["docs"] == 120
    assert 0 < summary["kept"] < 120
    assert summary["chunks_run"] == 2
    # second invocation: all chunks committed → nothing reprocessed
    assert main(["filter", "--input", pages, "--output", out,
                 "--chunks", "2"]) == 0
    summary2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary2["chunks_run"] == 0 and summary2["chunks_skipped"] == 2
    assert summary2["docs"] == 120 and summary2["kept"] == summary["kept"]


def test_analyse_and_check(spark, tmp_path, capsys):
    out_json = str(tmp_path / "profile.json")
    report = str(tmp_path / "report.txt")
    check_json = str(tmp_path / "check.json")
    docs = "/root/testdata/sf0.001/documents.parquet"

    assert main(["analyse", "--file", docs, "--output", out_json]) == 0
    profile = json.load(open(out_json))["profile"]
    assert "text" in profile and "stats" in profile["text"]

    rc = main(["check", "--file", docs, "--report", report,
               "--json", check_json])
    assert rc in (0, 1)  # 1 = some rule failed; both are valid outcomes
    assert os.path.exists(report)
    blob = json.load(open(check_json))
    assert blob["health"]["health_score"] > 0
    assert blob["rules"]
    capsys.readouterr()


def test_package_zip(tmp_path):
    dest = str(tmp_path / "dist")
    assert main(["package", "--dest", dest]) == 0
    zp = os.path.join(dest, "datacanary_spark.zip")
    names = zipfile.ZipFile(zp).namelist()
    assert "datacanary_spark/cli.py" in names
    assert "datacanary_spark/plans/pipeline.py" in names
    assert all(n.endswith(".py") for n in names)
