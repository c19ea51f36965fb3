# Test tiers (see README "Tests"). The full tier is the release gate —
# run it before shipping; record the date below when it was last green.
#
# Last full-tier green: 2026-08-17 (round 3; see PROGRESS.jsonl)

.PHONY: test test-mid test-full bench

test:
	python -m pytest -m smoke -q

test-mid:
	python -m pytest -m "not slow" -q

test-full:
	python -m pytest tests/ -q

bench:
	python bench.py
