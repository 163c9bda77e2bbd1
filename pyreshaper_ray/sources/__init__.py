"""Sources/sinks and schema adapters."""
