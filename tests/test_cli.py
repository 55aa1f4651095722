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


def test_cli_table_write_index_read(spark, tmp_path, capsys):
    tbl = str(tmp_path / "tbl")
    main([
        "table-write", "--input", f"{SF}/events.parquet", "--out", tbl,
        "--by", "day:ts,bucket4:user_id",
    ])
    wrote = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert wrote["rows"] == 1000 and wrote["partitions"] > 10
    assert [s["name"] for s in wrote["spec"]] == ["ts_day", "user_id_b4"]

    main(["table-index", "--table", tbl, "--col", "user_id"])
    idx = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert idx["partitions"] == wrote["partitions"] and idx["k"] == 5

    # point lookup: pruned, exact rows
    main(["table-read", "--table", tbl, "--eq", "user_id", "42", "--limit", "1000"])
    out = capsys.readouterr().out.strip().splitlines()
    report = json.loads(out[0])
    rows = [json.loads(l) for l in out[1:]]
    assert report["partitions_read"] < report["partitions_total"]
    assert report["rows_matched"] == len(rows)
    assert all(r["user_id"] == 42 for r in rows)

    # range read prunes and matches a plain filter count
    lo, hi = "2024-01-03 00:00:00", "2024-01-04 23:59:59"
    main(["table-read", "--table", tbl, "--range", "ts", lo, hi, "--limit", "0"])
    report2 = json.loads(capsys.readouterr().out.strip().splitlines()[0])
    want = (
        spark.read.parquet(f"{SF}/events.parquet")
        .where(f"ts BETWEEN '{lo}' AND '{hi}'")
        .count()
    )
    assert report2["rows_matched"] == want
    assert report2["partitions_read"] < report2["partitions_total"]


def test_cli_table_read_requires_exactly_one_mode(spark, tmp_path):
    with pytest.raises(SystemExit):
        main(["table-read", "--table", str(tmp_path)])


def test_cli_snapshot_lifecycle(spark, tmp_path, capsys):
    import json

    from wolf_quake_spark.cli import main

    base = str(tmp_path / "base")
    upd = str(tmp_path / "upd")
    tbl = str(tmp_path / "snaptbl")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.limit(20).coalesce(1).write.parquet(base)
    spark.read.parquet(base).limit(3).coalesce(1).write.parquet(upd)

    main(["snapshot", "create", "--table", tbl, "--input", base, "--keys", "doc_id"])
    sid1 = json.loads(capsys.readouterr().out)["snapshot_id"]
    main(["snapshot", "merge", "--table", tbl, "--input", upd])
    rep = json.loads(capsys.readouterr().out)
    assert rep["rewritten"] == 1  # single-file table: the one file rewrote
    main(["snapshot", "read", "--table", tbl, "--limit", "0"])
    assert json.loads(capsys.readouterr().out.splitlines()[0])["rows"] == 20
    # time travel to the pre-merge snapshot still works
    main(["snapshot", "read", "--table", tbl, "--snapshot-id", str(sid1), "--limit", "0"])
    assert json.loads(capsys.readouterr().out.splitlines()[0])["rows"] == 20
    # WAP: stage is invisible until publish
    main(["snapshot", "stage", "--table", tbl, "--input", upd])
    staged = json.loads(capsys.readouterr().out)["staged_snapshot_id"]
    main(["snapshot", "read", "--table", tbl, "--limit", "0"])
    assert json.loads(capsys.readouterr().out.splitlines()[0])["rows"] == 20
    main(["snapshot", "publish", "--table", tbl, "--snapshot-id", str(staged)])
    capsys.readouterr()
    main(["snapshot", "read", "--table", tbl, "--limit", "0"])
    assert json.loads(capsys.readouterr().out.splitlines()[0])["rows"] == 23
    # expire + gc reclaim the rewritten original file
    main(["snapshot", "expire", "--table", tbl, "--keep-last", "1"])
    assert json.loads(capsys.readouterr().out)["expired"]
    main(["snapshot", "gc", "--table", tbl])
    assert len(json.loads(capsys.readouterr().out)["removed"]) >= 1
    main(["snapshot", "read", "--table", tbl, "--limit", "0"])
    assert json.loads(capsys.readouterr().out.splitlines()[0])["rows"] == 23
