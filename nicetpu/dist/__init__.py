"""Multi-chip / multi-host sharded encode pipeline (SURVEY §2.2, §7.1.4)."""
