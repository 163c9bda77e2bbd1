"""Run state: checkpoint manifest (wmode analog), lineage + metrics."""
