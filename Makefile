# Test tiers (see README "Tests"). The full tier is the release gate —
# run it before shipping; record the date below when it was last green.
#
# Last full-tier green: 2026-08-19 (234 passed in 44:21 on a 1-core host,
# release drill artifacts/release/summary.json)

.PHONY: test test-mid test-full bench verify-release

test:
	python -m pytest -m smoke -q

test-mid:
	python -m pytest -m "not slow" -q

test-full:
	python -m pytest tests/ -q

bench:
	python bench.py

# The release drill: full tier + bench + 6-config bench suite + multi-chip
# dryrun + full-scale convert->demo rehearsal. Artifacts and per-stage logs
# land in artifacts/release/ (summary.json is the verdict). This is what
# round 5 runs before calling the project COMPLETE.
verify-release:
	python scripts/verify_release.py
