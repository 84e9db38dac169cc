"""Entry points (reference L6 ``runners/``)."""
