# Developer entry points. Everything runs on local[$SPARK_GRAFT_CPUS]
# (default 32); see README.md for the layout.

SF_DIR ?= /root/testdata/sf0.01

.PHONY: test correctness types bench plans daemon-demo

test:
	python -m pytest tests/ -q

# strict local oracle gate (sorted cell-exact vs DuckDB; stricter than
# the driver's order-insensitive hash)
correctness:
	python tools/check_correctness.py $(SF_DIR)

# oracle output types vs Spark schemas (the DuckDB HUGEINT-widening
# class that value-compares equal but hash-fails the driver gate)
types:
	python tools/oracle_types.py

bench:
	SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench.py

# regenerate the physical-plan audit table
plans:
	python tools/plan_audit.py /root/testdata/sf0.1 > PLANS.md

# one incremental daemon pass over the committed fixture chain
daemon-demo:
	python -m graphsense_blocksci_spark.plans.daemon \
	  fixtures/raw_blocks.parquet /tmp/gbs_daemon_sink --iterations 2
