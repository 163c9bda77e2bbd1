"""Ray Data stages: each a batch/group transform over Arrow blocks."""
