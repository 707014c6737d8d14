"""Engine-level scalar/aggregate expression helpers (all JVM-side)."""
