"""Streaming operators (SURVEY.md §2.B T1-T7): event-time windows,
watermarks, late-data policy, stateful per-key processing, and the
batch-equivalence harness that verifies streaming results against the
identical batch computation."""
