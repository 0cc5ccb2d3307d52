from cuking_tpu.io.metadata import InputMetadata, read_metadata, write_metadata  # noqa: F401
from cuking_tpu.io.parquet_ingest import ingest_parquet  # noqa: F401
from cuking_tpu.io.writer import write_results  # noqa: F401
