"""Ray Data stages: map_batches callables (stateless) and actor classes
(stateful, load-once-per-actor)."""
