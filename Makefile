# Developer targets. The pytest default scale is sf0.001 (fast local
# loop); the driver's correctness gate runs at sf0.01 and samples ~50
# of the catalog's queries per round, so `make sweep` is the only
# FULL-catalog signal at gate scale — run it each round and record the
# result in PERF.md ("sf0.01 oracle sweep" section).

.PHONY: test sweep lint-oracles bench

test:
	python -m pytest tests/ -x -q

# Full oracle catalog at the driver's gate scale (sf0.01).
sweep:
	SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 \
	python -m pytest tests/test_queries_oracle.py -q

# Oracle output-type lint only (fast; binds every oracle through DuckDB).
lint-oracles:
	python -m pytest tests/test_queries_oracle.py -q -k oracle_output_types

bench:
	python bench.py

# Synthetic multi-million-row scale checks (results recorded in PERF.md).
scale:
	python scale_check.py

# Regenerate the README catalog table (pass BENCH=path to fill timings).
catalog:
	python tools/catalog_table.py $(BENCH)
