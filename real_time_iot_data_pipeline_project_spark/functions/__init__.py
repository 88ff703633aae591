"""Pure Column-expression function libraries (no UDFs in the hot path)."""
