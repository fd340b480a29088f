"""Edit pipeline: prompt templating, VL preprocessing, orchestration."""
