from .ingest import stream_extract, stream_extract_to_catalog  # noqa: F401
