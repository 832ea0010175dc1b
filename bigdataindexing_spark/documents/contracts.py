"""Document-pipeline contract queries (rows-only; no SQL oracle).

Placeholder — populated in Phase 2 with shred/reassemble/merge/delete
round-trip checks registered as weaker rows-only queries.
"""
