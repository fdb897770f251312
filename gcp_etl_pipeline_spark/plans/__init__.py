"""Pre-built pipeline plans (verticals) shipped with the engine."""
