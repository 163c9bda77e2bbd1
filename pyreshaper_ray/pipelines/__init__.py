"""Pipeline builders: JobSpec (Specifier analog) → Ray Data pipelines."""
