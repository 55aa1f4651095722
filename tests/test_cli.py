"""CLI surface tests for the in-process subcommands (generate/run/report are
exercised end-to-end via submit.sh in the verify recipe and test_resume;
these cover the interactive sql/explain faces)."""

from __future__ import annotations

import json

import pytest

from wolf_quake_spark.cli import main

SF = "/root/testdata/sf0.001"


def test_cli_sql_json_lines(spark, capsys):
    main([
        "sql", "--sf-dir", SF, "--limit", "3",
        "--query",
        "SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang ORDER BY n DESC, lang",
    ])
    lines = [l for l in capsys.readouterr().out.strip().splitlines() if l.startswith("{")]
    rows = [json.loads(l) for l in lines]
    assert len(rows) == 3
    assert all(set(r) == {"lang", "n"} for r in rows)
    assert rows[0]["n"] >= rows[1]["n"] >= rows[2]["n"]


def test_cli_explain_known_query(spark, capsys):
    main(["explain", "--sf-dir", SF, "--query", "top_unshipped_revenue"])
    out = capsys.readouterr().out
    assert "Physical Plan" in out
    assert "TakeOrderedAndProject" in out


def test_cli_explain_unknown_query_exits(spark, capsys):
    with pytest.raises(SystemExit) as e:
        main(["explain", "--sf-dir", SF, "--query", "no_such_query"])
    assert e.value.code == 2
    assert "unknown query" in capsys.readouterr().out


def test_cli_compact(spark, tmp_path, capsys):
    import json

    from wolf_quake_spark.cli import main

    root = str(tmp_path / "sink")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.repartition(8).write.parquet(root)
    main(["compact", "--path", root, "--target-mb", "64"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["files_before"] == 8 and out["files_after"] == 1
    assert out["rows"] == 500
    assert spark.read.parquet(root).count() == 500
