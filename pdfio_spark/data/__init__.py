"""Derived public Adobe data tables (see tools/gen_tables.py)."""
