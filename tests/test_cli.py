"""CLI entry point (python -m hse_etl_ochirov_aldar_spark)."""

from __future__ import annotations

from hse_etl_ochirov_aldar_spark.__main__ import main


def test_cli_list(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "pricing_summary\t[oracle]" in out
    # r3: the exact-integer kmeans twin gave the IVF entry an oracle,
    # and the real PPM decode closed the last rows-only residual —
    # every catalog entry is oracle-backed
    assert "near_dedup_minhash\t[oracle]" in out
    assert "ann_ivf_kmeans_topk\t[oracle]" in out
    assert "multimodal_features\t[oracle]" in out
    assert "[rows-only]" not in out


def test_cli_run_and_pipeline(spark, sf_dir, tmp_path, capsys):
    assert main(["run", "daily_avg", "--sf-dir", sf_dir, "-n", "3"]) == 0
    assert "rows: 30" in capsys.readouterr().out

    assert main(["run", "nonexistent"]) == 2

    out_dir = str(tmp_path / "pipe")
    assert main(["pipeline", "--sf-dir", sf_dir, "--out", out_dir]) == 0
    got = capsys.readouterr().out
    assert "daily_extremes: 10 rows" in got
    assert spark.read.parquet(f"{out_dir}/clean_events").count() > 0
