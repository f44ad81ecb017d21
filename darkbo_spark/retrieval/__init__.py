"""Per-project retrieval index prebuild + serving — the reference's main
entry flow (prebuild_kb.py → IndexBuilder → query) as Spark plans over the
SnapshotTable storage layer."""
