# Developer targets. The pytest default scale is sf0.001 (fast local
# loop); the driver's correctness gate runs at sf0.01 and samples ~50
# of the catalog's queries per round, so `make sweep` is the only
# FULL-catalog signal at gate scale — run it each round and record the
# result in PERF.md ("sf0.01 oracle sweep" section).

.PHONY: test sweep lint-oracles bench bench-accept scale catalog plan-audit plan-audit-exec

test:
	python -m pytest tests/ -x -q

# Full oracle catalog at the driver's gate scale (sf0.01).
sweep:
	SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 \
	python -m pytest tests/test_queries_oracle.py -q

# Oracle lint (fast; no Spark): binds every oracle through DuckDB for
# hash-safe output types AND executes it at sf0.001 — runtime-only
# failures (e.g. recursive-CTE DECIMAL overflow) fail here, not at the
# driver. Run after ANY catalog change; no catalog change may land after
# the round's final `make sweep`.
lint-oracles:
	python -m pytest tests/test_queries_oracle.py -q \
		-k "oracle_output_types or oracle_executes"

bench:
	python bench.py

# Accept a bench run as the secondary regression reference: entries
# added after BENCH_REFERENCE.json was recorded are guarded against
# BENCH_PREV.json (bench.py two-tier guard). Run at round close on the
# round's accepted JSON line: `make bench-accept RUN=/tmp/bench.json`.
# Refuses non-gate-scale runs (ADVICE r7): see tools/bench_accept.py.
bench-accept:
	python tools/bench_accept.py $(RUN)

# Synthetic multi-million-row scale checks (results recorded in PERF.md).
scale:
	python scale_check.py

# Regenerate the README catalog table (pass BENCH=path to fill timings).
catalog:
	python tools/catalog_table.py $(BENCH)

# Catalog-wide physical-plan invariants (writes PLAN_AUDIT.md,
# non-zero exit on any unexpected flag).
plan-audit:
	python tools/plan_audit.py

# Same invariants over EVERY executed SQL plan, not just final-plan
# strings: runs each entry through the noop sink and audits all
# executions from the SQLAppStatusStore (slower; r10 verdict task #4).
plan-audit-exec:
	python tools/plan_audit.py --exec
