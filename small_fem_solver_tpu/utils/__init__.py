"""I/O, tables, plotting, logging utilities."""
