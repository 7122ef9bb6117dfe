"""bench.py's split-out modules (VERDICT r04 #8): util (shared
run-clock + stderr log), measure (model build + timing primitives),
legs (the measured extra legs), store (best-known-evidence record
merge + compact driver digest). bench.py at the repo root remains
the entrypoint and re-exports the test-visible names."""
