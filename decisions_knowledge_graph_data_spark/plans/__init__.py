"""Plans: staged end-to-end pipelines with checkpoint/resume + metrics."""
