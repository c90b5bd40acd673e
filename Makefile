# Common targets. SF dir override: make bench SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01
.PHONY: test bench plans inventory verify example

# driver-facing fast tier (tests marked `slow` are deselected by default;
# see tests/conftest.py). `make test-full` runs everything.
test:
	python -m pytest tests/ -x -q

test-full:
	SPARK_GRAFT_FULL_TESTS=1 python -m pytest tests/ -x -q

bench:
	python bench.py

plans:
	python tools/plan_report.py

inventory:
	python tools/survey_inventory.py

# the driver-style end-to-end check (vanilla session + DuckDB oracle)
verify:
	python -m pytest tests/test_oracle_parity.py -q

example:
	@DB=$$(mktemp -d) && \
	python -m dbt_parquet_spark seed --database "$$DB" --csv examples/animals/seeds/animals.csv && \
	python -m dbt_parquet_spark run  --database "$$DB" --models-dir examples/animals/models --single-file && \
	python -m dbt_parquet_spark test --database "$$DB" --models-dir examples/animals/models \
	    --model animals_str --unique animals --not-null n_legs
