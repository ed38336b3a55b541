"""CLI entry point (python -m hse_etl_ochirov_aldar_spark)."""

from __future__ import annotations

from hse_etl_ochirov_aldar_spark.__main__ import main


def test_cli_list(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "pricing_summary\t[oracle]" in out
    # r3: the exact-integer kmeans twin gave the IVF entry an oracle,
    # and the real PPM decode closed the last rows-only residual —
    # every DETERMINISTIC catalog entry is oracle-backed
    assert "near_dedup_minhash\t[oracle]" in out
    assert "ann_ivf_kmeans_topk\t[oracle]" in out
    assert "multimodal_features\t[oracle]" in out
    # r5: the two sketch entries were restructured into oracle-checkable
    # guarantee audits (GK rank bound / HLL-within-5%), so EVERY catalog
    # entry now carries a DuckDB oracle — the board has no rows-only
    # residue left
    rows_only = {
        ln.split("\t")[0] for ln in out.splitlines() if "[rows-only]" in ln
    }
    assert rows_only == set()


def test_cli_run_and_pipeline(spark, sf_dir, tmp_path, capsys):
    assert main(["run", "daily_avg", "--sf-dir", sf_dir, "-n", "3"]) == 0
    assert "rows: 30" in capsys.readouterr().out

    assert main(["run", "nonexistent"]) == 2

    out_dir = str(tmp_path / "pipe")
    assert main(["pipeline", "--sf-dir", sf_dir, "--out", out_dir]) == 0
    got = capsys.readouterr().out
    assert "daily_extremes: 10 rows" in got
    assert spark.read.parquet(f"{out_dir}/clean_events").count() > 0


def test_cli_sql_and_profile(spark, sf_dir, capsys):
    assert main(["sql", "SELECT count(*) AS n FROM nation",
                 "--sf-dir", sf_dir]) == 0
    assert "25" in capsys.readouterr().out

    assert main(["profile", "nation", "--sf-dir", sf_dir]) == 0
    out = capsys.readouterr().out
    assert "n_nationkey" in out and "n_distinct" in out

    assert main(["profile", "nonexistent"]) == 2


def test_cli_optimize_zorder(spark, tmp_path, capsys):
    src = str(tmp_path / "opt")
    spark.range(2000).selectExpr("id", "id % 50 AS x", "id % 7 AS y").write.parquet(src)
    assert main(["optimize", src, "--target-file-mb", "1",
                 "--zorder", "x,y"]) == 0
    assert "compacted to" in capsys.readouterr().out
    assert spark.read.parquet(src).count() == 2000
