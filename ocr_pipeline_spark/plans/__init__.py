"""End-to-end job plans."""
