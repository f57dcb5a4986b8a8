"""Engine operators beyond the raw query surface: session analytics,
snapshots, deduplication, similarity search."""
