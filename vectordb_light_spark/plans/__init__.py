"""Pipeline plans: end-to-end compositions of the engine's operators."""
