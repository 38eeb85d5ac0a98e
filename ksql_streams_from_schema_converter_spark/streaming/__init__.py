from .runner import run_pipeline_stream, stream_to_batch  # noqa: F401
