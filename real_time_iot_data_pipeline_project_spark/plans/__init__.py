"""Physical-plan inspection and audit helpers (see ``inspect.py``)."""
