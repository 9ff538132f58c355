"""Plan-level machinery: checkpoint manifests for idempotent resume."""
