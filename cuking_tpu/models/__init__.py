from cuking_tpu.models.king import KingConfig, KingEngine, ResultSet  # noqa: F401
