# Quality / build targets (reference: src/r1-v/Makefile style+quality).

check_dirs := spacer_tpu tests bench.py __graft_entry__.py

.PHONY: style quality test test-all native clean

style:
	python -m black $(check_dirs) 2>/dev/null || true
	python -m isort $(check_dirs) 2>/dev/null || true

quality:
	python -m flake8 --max-line-length 100 $(check_dirs) 2>/dev/null || \
	    python -m pyflakes $(check_dirs) 2>/dev/null || true

# fast loop: slow e2e/parity tests deselected (pyproject addopts)
test:
	python -m pytest tests/ -x -q

# the FULL suite, slow tests included.  Two pytest processes: a single
# process has been observed to segfault inside backend_compile near the
# end of the run (tests pass in isolation).  Characterized by
# tools/repro_xla_cpu_segfault.py (2026-08-20): 600 structure-varied
# compiles in one process complete with FLAT 228MB RSS, ruling out raw
# compile count — the trigger needs the suite's multi-GB large-program
# compiles on a heap holding every prior test's live executables; the
# process split bounds exactly that.
test-all:
	python -m pytest tests/test_[a-m]*.py -x -q -m ""
	python -m pytest tests/test_[n-z]*.py -x -q -m ""

native:
	$(MAKE) -C native

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
