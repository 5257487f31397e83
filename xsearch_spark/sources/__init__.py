"""Sources & sinks: format-switched readers/writers (Parquet locally,
Iceberg in production), doc-id assignment, synthetic code_files
generator, and the testdata loaders."""
