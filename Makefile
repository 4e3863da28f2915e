.PHONY: test test-full bench suite lint docs

docs:
	python tools/docgen.py
	python example.py

test:
	python -m pytest tests/ -q

test-full:
	KRYPY_TPU_TEST_STRIDE=1 python -m pytest tests/ -q

bench:
	python bench.py

suite:
	python benchmarks/suite.py

lint:
	python -m compileall -q krypy_tpu tests benchmarks examples
	python tools/lint.py
