"""Engine math: smooth dynamics, collision, constraints, integration."""
