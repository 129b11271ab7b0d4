"""Suite demos (reference suite/demos)."""
