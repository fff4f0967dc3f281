"""Sources: derived point tables, query workloads, pages corpus readers."""
