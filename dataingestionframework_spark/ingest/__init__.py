from .pipeline import IngestionPipeline, IngestResult

__all__ = ["IngestionPipeline", "IngestResult"]
